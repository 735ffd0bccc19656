"""Entity-name assembly + tag-set helpers (SURVEY.md §2.2 F2/F8, §2.4 M7).

Pure functions re-expressing:
* ``names_from_entity`` — /root/reference/matcher/wikidata.py:933-1015
  (labels + sitelinks with Category:-strip and case-fold merge + gated
  aliases + P373 commons cat + P1448 official name + P1705 native label +
  P18 image basename with suffix strips);
* ``find_matching_tags`` / ``tag_and_key_if_possible`` —
  /root/reference/matcher/matcher.py:348-357, 129-138;
* ``is_address_node`` — matcher.py:561-571.
"""

from __future__ import annotations

import re
from collections import defaultdict
from collections.abc import Collection, Mapping

_CATEGORY_PREFIX = "Category:"
_RE_IMAGE_EXT = re.compile(r"\.[a-z]{3,4}$")
_IMAGE_NOISE = (r" - geograph\.org\.uk - \d+$", r"[, -]*0\d{2,}$")


def names_from_entity(
    entity: Mapping, skip_lang: Collection[str] | None = None
) -> dict[str, list[tuple[str, str | None]]] | None:
    """Entity document -> {name: [(source, lang), ...]} (F2)."""
    if not entity or "labels" not in entity:
        return None
    skip = set(skip_lang or [])
    out: defaultdict[str, list[tuple[str, str | None]]] = defaultdict(list)

    for lang, label in entity["labels"].items():
        if lang not in skip:
            out[label["value"]].append(("label", lang))

    for site, link in entity.get("sitelinks", {}).items():
        if site + "wiki" in skip:
            continue
        title = link["title"]
        if title.startswith(_CATEGORY_PREFIX):
            title = title[len(_CATEGORY_PREFIX):]
        if not title:
            # a bare "Category:" title strips to nothing — skip the
            # malformed sitelink rather than fail the whole Arrow batch
            continue
        # merge with an existing lowercase-first variant
        if title[0].isupper():
            folded = title[0].lower() + title[1:]
            if folded in out:
                title = folded
        out[title].append(("sitelink", site))

    for lang, aliases in entity.get("aliases", {}).items():
        if lang in skip or len(aliases) > 3:
            continue
        for alias in aliases:
            out[alias["value"]].append(("alias", lang))

    claims = entity.get("claims", {})

    def _claim_values(pid: str):
        for claim in claims.get(pid, []):
            snak = claim.get("mainsnak", {})
            if "datavalue" in snak:
                yield snak["datavalue"]["value"]

    for value in _claim_values("P373"):
        out[value].append(("commonscat", None))
    for value in _claim_values("P1448"):
        out[value["text"]].append(("officialname", value["language"]))
    for value in _claim_values("P1705"):
        out[value["text"]].append(("nativelabel", value["language"]))
    for value in _claim_values("P18"):
        m = _RE_IMAGE_EXT.search(value)
        if m:
            value = value[: m.start()]
        for noise in _IMAGE_NOISE:
            m = re.search(noise, value)
            if m:
                value = value[: m.start()]
                break
        out[value].append(("image", None))

    return dict(out)


def prefer_specific_tags(tags: Collection[str]) -> set[str]:
    """Drop bare ``k`` when ``k=v`` is present (matcher.py:129-138)."""
    result = set(tags)
    for key in sorted(t for t in result if "=" not in t):
        if any(t.startswith(key + "=") for t in result) and key in result:
            result.remove(key)
    return result


def matching_tags(
    record_tags: Mapping[str, str], expected: Collection[str]
) -> set[str]:
    """Intersect record tags with the expected tag set, honouring
    ``;``-multivalues (M7; matcher.py:348-357)."""
    hits = set()
    for tag in expected:
        if "=" in tag:
            key, _, value = tag.partition("=")
            if key in record_tags and value in set(record_tags[key].split(";")):
                hits.add(tag)
        elif tag in record_tags:
            hits.add(tag)
    return prefer_specific_tags(hits)


def is_address_node(rec_type: str, tags: Mapping[str, str]) -> bool:
    """Node that is only an address (F10; matcher.py:561-571)."""
    if rec_type != "node" or "addr:housename" in tags:
        return False
    return all(
        key.startswith("addr:") or key.startswith("source:") or key in {"entrance", "source"}
        for key in tags
    )
