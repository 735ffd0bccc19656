# Differential fuzz: check_for_match trim_house parity (house-heavy vocab)
import conftest
import sys, random
match_ref = sys.modules['matcher.match']
from osm_wikidata_spark.kernel import records

vocab = ["Oakway House", "Oakway", "Nutbourne House", "Nutbourne", "The Old House",
         "Castle House", "12 Station Road", "Manor Farm House", "Manor", "Manor house",
         "Rose Cottage", "White House Farm", "house", "House"]
keys = ["name", "alt_name", "addr:housename", "old_name"]
rng = random.Random(99)
mismatch = 0; total = 0
for i in range(8000):
    tags = {}
    for _ in range(rng.randint(1, 3)):
        tags[rng.choice(keys)] = rng.choice(vocab)
    wd = {}
    for _ in range(rng.randint(1, 3)):
        wd[rng.choice(vocab)] = [("label", "en")]
    endings = rng.choice([None, ["house"], ["church"], ["house", "inn"]])
    places = rng.choice([None, ["Nutbourne"]])
    th = rng.random() < 0.5
    try:
        r = match_ref.check_for_match(dict(tags), dict(wd), endings=list(endings) if endings else None,
                                      place_names=places, trim_house=th)
    except Exception:
        continue
    g = records.check_for_match(dict(tags), dict(wd), endings=list(endings) if endings else None,
                                place_names=places, trim_house=th)
    total += 1
    if r != g:
        mismatch += 1
        if mismatch <= 5:
            print("MISMATCH", tags, list(wd), endings, places, "trim_house=", th)
            print("  ref=", r); print("  got=", g)
print(f"total={total} mismatches={mismatch}")
