# Differential fuzz: address / identifier / extract kernels (M4, M5, M6)
# vs reference match.check_identifier / check_name_matches_address /
# check_for_address_in_extract.
import conftest  # noqa: F401  (installs stubs + reference modules)
import sys, random

match_ref = sys.modules['matcher.match']
from osm_wikidata_spark.kernel import records

streets = ["Station Road", "High Street", "Main St", "Avenue Rd", "Church Lane",
           "Broadway", "5th Avenue", "Quai d'Orsay", "Baker Street"]
cities = ["Bromley", "Cleveland", "York", "Folkestone", None]
postcodes = ["BR1 3NN", "SW1A 1AA", "44113", "10001", None]
numbers = ["12", "1-3", "27", "110", "5", "221B"]
building_words = ["", " Building", " House", " street in York"]

rng = random.Random(123)


def rand_tags():
    tags = {}
    if rng.random() < 0.8:
        tags["addr:housenumber"] = rng.choice(numbers)
    if rng.random() < 0.8:
        tags["addr:street"] = rng.choice(streets)
    if rng.random() < 0.3:
        tags["addr:full"] = rng.choice(numbers) + " " + rng.choice(streets)
    pc = rng.choice(postcodes)
    if pc:
        tags["addr:postcode"] = pc
    city = rng.choice(cities)
    if city:
        tags["addr:city"] = city
    return tags


def rand_names(tags):
    names = []
    for _ in range(rng.randint(0, 4)):
        r = rng.random()
        hn = tags.get("addr:housenumber", rng.choice(numbers))
        st = tags.get("addr:street", rng.choice(streets))
        if r < 0.35:
            names.append(hn + " " + st + rng.choice(building_words))
        elif r < 0.5:
            names.append(st + " " + hn)
        elif r < 0.65:
            n = hn + " " + st
            if rng.random() < 0.5 and tags.get("addr:postcode"):
                n += " " + tags["addr:postcode"].split()[0]
            if rng.random() < 0.5:
                n += ", " + (tags.get("addr:city") or "Town")
            names.append(n)
        elif r < 0.8:
            names.append(rng.choice(["The Old Rectory", "Castle House",
                                     "Post Office", "Saint Mary's Church"]))
        else:
            names.append(rng.choice(numbers) + " " + rng.choice(streets))
    return names


mismatch = total = 0
for i in range(15000):
    tags = rand_tags()
    names = rand_names(tags)
    try:
        r = match_ref.check_name_matches_address(tags, names)
    except Exception:
        continue
    g = records.address_match(tags, names)
    total += 1
    if r != g:
        mismatch += 1
        if mismatch <= 5:
            print("MISMATCH address", tags, names, "ref", r, "got", g)
print(f"check_name_matches_address: total={total} mismatches={mismatch}")

extracts = [
    "It stands at 12 Station Road in the town centre.",
    "The buildings at 10 and 12 Station Road were demolished.",
    "Located at 27-29 High Street, it was built in 1900.",
    "The museum is on 5th Ave near the park.",
    "No address is mentioned here at all.",
    "Its address, 110 Broadway, appears mid-sentence.",
]
mismatch = total = 0
for i in range(15000):
    tags = rand_tags()
    extract = rng.choice(extracts)
    if rng.random() < 0.3:
        hn = tags.get("addr:housenumber")
        st = tags.get("addr:street")
        if hn and st:
            extract = f"The site at {hn} {st} is notable."
            if rng.random() < 0.3:
                extract = f"Between {rng.choice(numbers)} and {hn} {st}."
    try:
        r = match_ref.check_for_address_in_extract(tags, extract)
    except Exception:
        continue
    g = records.address_in_extract(tags, extract)
    total += 1
    if r != g:
        mismatch += 1
        if mismatch <= 5:
            print("MISMATCH extract", tags, repr(extract), "ref", r, "got", g)
print(f"check_for_address_in_extract: total={total} mismatches={mismatch}")

id_keys = ["ref:nrhp", "website", "iata", "wikidata", "phone"]
id_values = ["86000123", "66000001", "https://www.example.com/", "example.com",
             "LAX", "lax", "Q42", "12 34", "1234", "+1 216 555", "0042"]
mismatch = total = 0
for i in range(15000):
    tags = {rng.choice(id_keys): rng.choice(id_values)
            for _ in range(rng.randint(0, 3))}
    idents = {}
    for _ in range(rng.randint(0, 3)):
        k = rng.choice(id_keys)
        vals = {rng.choice(id_values) for _ in range(rng.randint(1, 2))}
        label = "website" if k == "website" and rng.random() < 0.8 else k
        idents.setdefault(k, []).append((vals, label))
    try:
        r = match_ref.check_identifier(tags, idents)
    except Exception:
        continue
    g = records.identifier_match(tags, idents)
    total += 1
    if r != g:
        mismatch += 1
        if mismatch <= 5:
            print("MISMATCH identifier", tags, idents, "ref", r, "got", g)
print(f"check_identifier: total={total} mismatches={mismatch}")
