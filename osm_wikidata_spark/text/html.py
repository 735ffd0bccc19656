"""Bold-name extraction from article-extract HTML (SURVEY.md §2.2 F7).

The reference parses the first-paragraph HTML of a Wikipedia extract and
collects ``<b>`` text that is not inside ``<small>`` (pronunciation guides)
or ``<ul>`` (`/root/reference/matcher/wikipedia.py:126-139`, lxml xpath
``.//b[not(ancestor::small)][not(ancestor::ul)]``).  lxml is not available
in this environment; article extracts are flat first-paragraph HTML, so a
regex scan reproduces the semantics: drop small/ul regions, take each
``<b>…</b>``'s text content, keep strings longer than one character.
"""

from __future__ import annotations

import re

_RE_EXCLUDED_REGION = re.compile(
    r"<(small|ul)\b[^>]*>.*?</\1\s*>", re.I | re.S
)
_RE_BOLD = re.compile(r"<b\b[^>]*>(.*?)</b\s*>", re.I | re.S)
_RE_TAG = re.compile(r"<[^>]+>")


def html_names(article: str | None) -> list[str]:
    """Bold display names of an extract (wikipedia.py:126-139 semantics)."""
    if not article or article.strip() == "":
        return []
    cleaned = _RE_EXCLUDED_REGION.sub(" ", article)
    names = [_RE_TAG.sub("", m) for m in _RE_BOLD.findall(cleaned)]
    # the length filter is deliberately PRE-strip, exactly like the
    # reference's `if len(n) > 1` guard (wikipedia.py:139): "<b> x </b>"
    # passes the filter and yields "x" there, so it must here too
    return [n.strip() for n in names if len(n) > 1]
