import conftest  # installs stubs + reference modules
import sys, random, itertools
match_ref = sys.modules['matcher.match']
from osm_wikidata_spark.kernel import cascade, records

vocab = ["Saint Andrew's Church", "St Andrew", "Lake No. 10", "Lake Number Ten",
         "3rd Avenue", "149th Street", "Oxmoor Mall", "Oxmoor Center", "The Old Rectory",
         "RGC – Rainbow Grocery Coop", "TIAT", "This Is A Test", "Manhattan Community Board 11",
         "Welcome Break Gordano Services", "Church of Ss Peter and Paul", "HEB Center @ Cedar Park",
         "110 Livingston", "1-3 Rectory Cottages", "Hôpital Saint-François d'Assise",
         "Кастелець", "Թի Դի Գարդեն", "Stop24 Folkestone Services", "Main Street Station",
         "site of Pegwell Lodge", "Statue of John Smith", "Boots", "The Boot Inn",
         "Times Furnishing Company Building", "Bishop Justus CofE School", "Castle House",
         "12 Station Road", "Hall", "Post Office", "Church Street & 18th Street", "5, High Street"]
endings_pool = [None, ["church"], ["church", "church of"], ["house", "inn"], ["mall", "center"],
                ["public house"], ["station"], ["building"], ["hall", "post office"], ["stable"]]
places_pool = [None, ["Cleveland", "Ohio"], ["New York"], ["Oslo"], ["Folkestone", "Kent"]]

rng = random.Random(42)
def perturb(s):
    ops = [lambda x: x, lambda x: x.lower(), lambda x: x.upper(), lambda x: "The " + x,
           lambda x: x + " Building", lambda x: x.replace(" ", "-"), lambda x: x + "s",
           lambda x: "Old " + x, lambda x: x + ", Powys", lambda x: x.replace("e", "é"),
           lambda x: "12 " + x, lambda x: x + " 42"]
    return rng.choice(ops)(s)

mismatch = 0; total = 0
for i in range(30000):
    a = perturb(rng.choice(vocab)); b = perturb(rng.choice(vocab))
    endings = rng.choice(endings_pool); places = rng.choice(places_pool)
    e1 = set(endings) if endings else None
    e2 = set(endings) if endings else None
    try:
        r = match_ref.name_match(a, b, e1, place_names=places)
    except Exception as ex:
        continue
    g = cascade.match_names(a, b, e2, place_names=places)
    total += 1
    rk = r.match_type.name if r else None
    gk = g.kind if g else None
    if rk != gk:
        mismatch += 1
        if mismatch <= 10:
            print("MISMATCH", repr(a), repr(b), endings, places, "ref=", rk, "got=", gk)
print(f"total={total} mismatches={mismatch}")
