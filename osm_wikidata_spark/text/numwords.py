"""English number-to-words (minimal, deterministic ``num2words`` stand-in).

The reference uses ``num2words`` for two things
(`/root/reference/matcher/match.py:27,478,733-738`):

* ``num2words(n)`` — cardinal, e.g. ``42 -> "forty-two"``,
  ``149 -> "one hundred and forty-nine"`` (British "and", comma-joined
  thousand groups);
* ``num2words(n, to="ordinal")`` — ordinal, e.g. ``3 -> "third"``.

Only English is required by the fixtures.  Both sides of a comparison are
converted by the same function, so exactness beyond the fixture vocabulary
matters less than determinism — but we mimic num2words' en formatting.
"""

from __future__ import annotations

_ONES = (
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
)
_TENS = (
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
)
_SCALES = (
    (10**9, "billion"),
    (10**6, "million"),
    (10**3, "thousand"),
)

_ORDINAL_SPECIAL = {
    "one": "first",
    "two": "second",
    "three": "third",
    "five": "fifth",
    "eight": "eighth",
    "nine": "ninth",
    "twelve": "twelfth",
}


def _under_thousand(n: int) -> str:
    assert 0 <= n < 1000
    if n < 20:
        return _ONES[n]
    if n < 100:
        tens, unit = divmod(n, 10)
        return _TENS[tens] + ("-" + _ONES[unit] if unit else "")
    hundreds, rem = divmod(n, 100)
    head = _ONES[hundreds] + " hundred"
    return head + (" and " + _under_thousand(rem) if rem else "")


def cardinal(n: int | str) -> str:
    """Integer to English words, num2words-en style."""
    n = int(n)
    if n < 0:
        return "minus " + cardinal(-n)
    if n < 1000:
        return _under_thousand(n)
    parts: list[str] = []
    rem = n
    for scale, word in _SCALES:
        if rem >= scale:
            count, rem = divmod(rem, scale)
            parts.append(_under_thousand(count) + " " + word)
    if rem:
        tail = _under_thousand(rem)
        joiner = " and " if rem < 100 else ", "
        return ", ".join(parts) + joiner + tail
    return ", ".join(parts)


def ordinal(n: int | str) -> str:
    """Integer to English ordinal words (``3 -> "third"``)."""
    words = cardinal(int(n))
    # Ordinalise only the final word (after the last space or hyphen).
    cut = max(words.rfind(" "), words.rfind("-"))
    head, last = (words[: cut + 1], words[cut + 1 :]) if cut != -1 else ("", words)
    if last in _ORDINAL_SPECIAL:
        last = _ORDINAL_SPECIAL[last]
    elif last.endswith("y"):
        last = last[:-1] + "ieth"
    else:
        last = last + "th"
    return head + last
