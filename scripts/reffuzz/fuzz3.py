# differential fuzz: records.get_all_matches vs reference match.get_all_matches
import conftest
import sys, random
match_ref = sys.modules['matcher.match']
from osm_wikidata_spark.kernel import records

vocab = ["Gordano services", "Church Of St Michael", "Samson And Lion Public House",
         "National Museum of Mathematics", "Momath", "BAC", "Baryshnikov Arts Center",
         "Rainbow Grocery Coop", "The Boot Inn", "Manhattan Community Board 1",
         "Lake No. 10", "Lake Number Ten", "Saint Mary", "St Mary"]
keys = ["name", "alt_name", "operator", "old_name", "name:en"]
rng = random.Random(11)
mismatch = 0; total = 0
for i in range(4000):
    tags = {rng.choice(keys): rng.choice(vocab) for _ in range(rng.randint(1, 3))}
    wd = {rng.choice(vocab): "label" for _ in range(rng.randint(1, 3))}
    endings = rng.choice([None, {"church"}, {"services"}, {"public house", "inn"}])
    ref = match_ref.get_all_matches(tags, wd, set(endings) if endings else None)
    ours = records.get_all_matches(tags, wd, tuple(endings) if endings else None)
    ref_set = sorted((m.osm_key, m.osm_name, m.wikidata_name,
                      m.match_type.name if hasattr(m.match_type, 'name') else str(m.match_type))
                     for m in ref)
    our_set = sorted((k, o, w, kind) for k, o, w, kind in ours)
    total += 1
    if ref_set != our_set:
        mismatch += 1
        if mismatch <= 3:
            print("MISMATCH", tags, wd, endings, ref_set, our_set)
print(f"total={total} mismatches={mismatch}")
