"""P12 — display-label mojibake repair (reference api/app/main.py:624-657).

Labels from the INPE CSVs and IBGE dims occasionally arrive
double-encoded (UTF-8 bytes decoded as latin1) or already damaged with
U+FFFD replacement characters. Every label the serve layer returns
passes through `clean_display_label`:

1. try the latin1 -> utf-8 recode (undoes double-encoding when the
   recode is lossless and strictly improves the string);
2. patch the common Brazilian toponym damage `S?o` -> `São`;
3. degrade remaining replacement chars to 'a', then to a pure-ASCII
   transliteration if damage persists.

Driver-side only — applied to <= top-k label values per response.
"""

from __future__ import annotations

import unicodedata

_REPL = "�"
# U+FFFD's UTF-8 bytes decoded as latin1 — the "already re-broken" form
_BAD_TRIPLET = "ï¿½"
_SAO = "São"
_SAO_LOW = "são"


def ascii_label(text: str) -> str:
    """NFKD transliteration to pure ASCII (accents stripped)."""
    return unicodedata.normalize("NFKD", text).encode("ascii", "ignore").decode("ascii")


def clean_display_label(label: str) -> str:
    out = str(label or "").strip()
    if not out:
        return out

    has_mojibake = _REPL in out or _BAD_TRIPLET in out

    try:
        recoded = out.encode("latin1").decode("utf-8")
        if recoded and recoded != out and _REPL not in recoded:
            out = recoded
            has_mojibake = _REPL in out or _BAD_TRIPLET in out
    except UnicodeError:
        pass

    if not has_mojibake:
        return out

    patched = out
    for marker in (_REPL, _BAD_TRIPLET):
        patched = patched.replace(f"S{marker}o", _SAO)
        patched = patched.replace(f"s{marker}o", _SAO_LOW)
    patched = patched.replace(_REPL, "a").replace(_BAD_TRIPLET, "a")
    if _REPL in patched or _BAD_TRIPLET in patched:
        patched = ascii_label(patched)
    return patched
