import conftest
import sys, random
match_ref = sys.modules['matcher.match']
from osm_wikidata_spark.kernel import records

vocab = ["Gordano services", "Folkestone services", "Stop 24 services", "Lombard Building",
         "Church Of St Michael", "Samson And Lion Public House", "St. Vitus's Church, Cleveland",
         "National Museum of Mathematics", "Momath", "BAC", "Baryshnikov Arts Center", "test",
         "Rainbow Grocery Coop", "The Boot Inn", "Roslindale Theatre", "Manhattan Community Board 1"]
keys = ["name", "alt_name", "operator", "previous_name", "addr:housename", "old_name", "name:en"]
rng = random.Random(7)
mismatch = 0; total = 0
for i in range(4000):
    tags = {}
    for _ in range(rng.randint(1, 3)):
        tags[rng.choice(keys)] = rng.choice(vocab)
    if rng.random() < 0.3:
        tags["addr:city"] = rng.choice(["Rome", "Folkestone", "Birmingham"])
    wd = {}
    for _ in range(rng.randint(1, 3)):
        wd[rng.choice(vocab)] = [("label", "en")]
    endings = rng.choice([None, ["church"], ["building"], ["services"], ["public house", "inn"]])
    places = rng.choice([None, ["Cleveland"], ["Folkestone", "Kent"]])
    # skip cases hitting the known reference strip-operator bug (operator tag that
    # is a prefix of another name) — our behaviour intentionally differs there
    op = tags.get("operator", "").lower()
    skip = op and any(k != "operator" and op in v.lower() and v.lower().find(op) == 0 for k, v in tags.items())
    if skip:
        continue
    try:
        r = match_ref.check_for_match(dict(tags), dict(wd), endings=list(endings) if endings else None, place_names=places)
    except Exception:
        continue
    g = records.check_for_match(dict(tags), dict(wd), endings=list(endings) if endings else None, place_names=places)
    total += 1
    if r != g:
        mismatch += 1
        if mismatch <= 5:
            print("MISMATCH", tags, list(wd), endings, places)
            print("  ref=", r)
            print("  got=", g)
print(f"total={total} mismatches={mismatch}")
