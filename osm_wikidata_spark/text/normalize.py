"""Name-normalisation vocabulary of the match kernel (SURVEY.md §2.3, N1-N9).

Pure ``str -> str`` functions whose behaviour is pinned by the reference's
fixtures (`/root/reference/tests/test_match.py:15-24,94-96` etc.).  Semantics
follow `/root/reference/matcher/match.py:103-195,299-343,733-762` and
`/root/reference/matcher/utils.py:43-47,105-112` — re-expressed here as
table-driven transforms so they vectorise cleanly inside pandas UDFs
(apply over ``Series.drop_duplicates()`` then map back).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from functools import lru_cache

from .numwords import cardinal, ordinal
from .translit import transliterate

RE_STRIP_NON_CHARS = re.compile(r"[^-@\w]", re.U)
RE_STRIP_NON_CHARS_AND_DASH = re.compile(r"[^@\w]", re.U)
RE_NON_LETTER_START = re.compile(r"^[^A-Z]+", re.I | re.U)
RE_DIGITS = re.compile(r"\d+")
RE_ORDINAL_NUMBER = re.compile(r"(\d+) ?(?:st|nd|rd|th)\b", re.I)
RE_NON_CHAR_START = re.compile(r"^[^@\w]*", re.U)
_RE_ARTICLE = re.compile(r"^(\W*)(the|le|la|les)[- ]")
_RE_STOPWORDS = re.compile(r"([ -])(?:the|and|a|an|at|of|de|di|le|la|les|von|pw\.)(?=\1)")
_RE_PLURAL = re.compile(r"(?<=.)e?s+\b")

# Ordered literal replacement table applied by tidy_name
# (semantics: /root/reference/matcher/match.py:107-166).  Grouped for
# readability; application order is the flattened order below.
_TIDY_REPLACEMENTS: tuple[tuple[str, str], ...] = (
    # abbreviation folding
    (" no. ", " number "), (" nr ", " number "), (" hosp ", " hospital "),
    (" rgnl ", " regional "), ("saint ", "st "), ("mount ", "mt "),
    (" mountain", " mtn"), (" county", " co"),
    (" church of england ", " ce "), (" cofe ", " ce "), (" c of e ", " ce "),
    (" @ ", " at "), (" roman catholic ", " rc "), (" catholic ", " rc "),
    # saint-name spelling folds
    (" helena", " helen"), (" laurence", " lawrence"),
    (" holy ascension", "ascension"), (" most holy trinity", "holy trinity"),
    (" nicolas", " nicholas"), (" anne", " ann"),
    (" ethelreda", " etheldreda"), (" mary magdalene", " mary magdalen"),
    (" mary magdelene", " mary magdalen"), (" mary the virgin", " mary"),
    (" blessed virgin mary", " st mary"),
    (" nativity of the blessed virgin mary", " st mary"),
    (" margaret the queen", " margaret"), (" john the baptist", " john"),
    (" john the evangelist", " john"), (" john, the evangelist", " john"),
    (" john, apostle and evangelist", " john"), (" john the divine", " john"),
    (" michael the archangel", " michael"), (" luke the evangelist,", " luke"),
    (" giles the abbot", " giles"), (" andrew the apostle", " andrew"),
    (" peter the apostle", " peter"), (" thomas the apostle", " thomas"),
    (" lawrence the martyr", " lawrence"), (" alban the martyr", " alban"),
    (" egelwin the martyr", " egelwin"),
    (" nicholas the confessor", " nicholas"),
    (" edward the confessor", " edward"), (" edward the martyr", " edward"),
    (" edmund king and martyr", " edmund"), (" gregory the great", " gregory"),
    (" james the great", " james"), (" james the less", " james"),
    (" james the apostle", " james"), (" bartholemew", " bartholomew"),
    # institution folds
    (" preparatory school", " prep school"), (" incorporated", " inc"),
    (" cooperative", " coop"), (" co-operative", " coop"),
    (" hotel and country club", " hotel"), (" hotel and spa", " hotel"),
    (" missionary baptist", " baptist"),
    (" thomas a becket", " thomas becket"),
    (" thomas of canterbury", " thomas becket"),
)


@lru_cache(maxsize=1 << 16)
def tidy_name(name: str) -> str:
    """Normalise a lowercase name (N1; match.py:103-177 semantics).

    Pure, so cached: inside a candidate block every name is tidied once per
    neighbour — the cache collapses that to once per distinct name per
    executor (the reference pays this cost per pair, match.py:466-467).
    """
    n = transliterate(name).strip().rstrip("'")
    for old, new in _TIDY_REPLACEMENTS:
        n = n.replace(old, new)
    if n.endswith("'s"):
        n = n[:-2]
    # plural strip, guarded so an all-s token like " s " survives
    if any(c.isalpha() and c != "s" for c in n):
        n = _RE_PLURAL.sub("", n)
    n = n.replace("ss", "s")
    return n.replace("center", "centre").replace("theater", "theatre")


def drop_article(name: str) -> str:
    """Strip a leading article (N2; match.py:180-186 semantics)."""
    m = _RE_ARTICLE.match(name)
    return m.group(1) + name[m.end():] if m else name


def strip_words(name: str) -> str:
    """Drop stopwords sitting between identical separators (N3; match.py:189-195)."""
    return _RE_STOPWORDS.sub(lambda m: m.group(1), name)


def ordinal_number_to_word(name: str) -> str:
    """``3rd -> third`` (N5; match.py:733-738 semantics)."""
    return RE_ORDINAL_NUMBER.sub(lambda m: ordinal(m.group(1)), name)


def normalize_name(name: str) -> str:
    """Lowercased, ordinal-expanded, word-chars-only key (N4; match.py:741-745)."""
    name = ordinal_number_to_word(name)
    name = name.replace(" bij ", "")  # Dutch "at"
    return RE_STRIP_NON_CHARS.sub("", name.lower())


def digits_of(name: str) -> list[str]:
    """Digit-run fingerprint; equal lists are the numeric guard (N6)."""
    return RE_DIGITS.findall(name)


def normalized_name_match(a: str, b: str) -> bool:
    """Normalised equality that refuses to merge distinct numbers (match.py:748-753)."""
    return digits_of(a) == digits_of(b) and normalize_name(a) == normalize_name(b)


def normalized_name_startswith(name: str, prefix: str) -> bool:
    """Normalised prefix test with the numeric guard (match.py:756-762)."""
    prefix_digits = digits_of(prefix)
    return (
        digits_of(name)[: len(prefix_digits)] == prefix_digits
        and normalize_name(name).startswith(normalize_name(prefix))
    )


def number_words_form(name: str) -> str:
    """Replace every digit run with its cardinal words (match.py:475-480)."""
    return RE_DIGITS.sub(lambda m: cardinal(int(m.group(0))), name)


def strip_non_char_start(s: str) -> str:
    """Drop non-word characters from the start (match.py:299-302)."""
    return RE_NON_CHAR_START.sub("", s)


def strip_non_letter_start(s: str) -> str:
    """Drop anything before the first ASCII letter (match.py:305-306)."""
    return RE_NON_LETTER_START.sub("", s)


def split_on_upper(name: str) -> Iterator[str]:
    """Split at uppercase positions, CamelCase/initials aware (N8; match.py:327-338)."""
    positions = [i for i, c in enumerate(name) if c.isupper()]
    start = 0
    for pos in positions:
        piece = name[start:pos].rstrip()
        if piece:
            yield piece
        start = pos
    piece = name[start:].rstrip()
    if piece:
        yield piece


def split_on_upper_and_tidy(name: str) -> list[str]:
    """Uppercase split with punctuation stripped per part (match.py:341-343)."""
    parts = (RE_STRIP_NON_CHARS.sub("", p) for p in split_on_upper(name))
    return [p for p in parts if p]


def no_alpha(s: str) -> bool:
    """True when the string has no alphabetic characters (match.py:85-87)."""
    return not any(c.isalpha() for c in s)


def any_upper(s: str) -> bool:
    """True when the string has an uppercase character (utils.py:110-112)."""
    return any(c.isupper() for c in s)


def normalize_url(url: str) -> str:
    """Scheme/www/trailing-slash-insensitive URL key (F12; utils.py:43-47)."""
    for prefix in ("http://", "https://", "www."):
        if url.startswith(prefix):
            url = url[len(prefix):]
    return url.rstrip("/")


def is_in_range(address_range: str, address: str) -> bool:
    """Is ``address``'s house number inside ``address_range`` (utils.py:154-178)."""
    re_range = re.compile(r"\b(\d+) ?(?:to|-) ?(\d+)\b", re.I)
    re_number_list = re.compile(r"\b([\d, ]+) (?:and|&) (\d+)\b", re.I)
    re_number = re.compile(r"^(?:No\.?|Number)? ?(\d+)\b")

    m_number = re_number.match(address)
    if not m_number:
        return False

    m_range = re_range.search(address_range)
    if m_range:
        if re_range.search(address):
            return False
        return int(m_range.group(1)) <= int(m_number.group(1)) <= int(m_range.group(2))

    m_list = re_number_list.search(address_range)
    if m_list:
        if re_number_list.search(address):
            return False
        numbers = {n.strip() for n in m_list.group(1).split(",")} | {m_list.group(2)}
        return m_number.group(1) in numbers

    return False
