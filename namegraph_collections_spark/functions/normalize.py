"""Deterministic name normalization (SURVEY §2.7 C4 ★).

Reference: ``force_normalize`` (/root/reference/airflow/dags/
create_merged.py:163-184) = ens_cure → drop '-'/"'" → unidecode
Latin-script chars → re-cure. The real ens-normalize + unidecode are
external libraries; per SURVEY §7 the engine ships a *simplified
deterministic* normalizer whose contract is fixed by the reference's
golden tests (tests/test_wiki_api.py:143-148):

    'Adolfo Pérez Esquivel'  → 'adolfopérezesquivel'   (Latin accents kept)
    'Betty Williams'         → 'bettywilliams'          (spaces removed)
    'ιοσρβυνγ'               → DisallowedLabel          (non-Latin dropped)

Spec: NFKC → casefold → remove space/hyphen/apostrophe/quote/dot →
every remaining char must be a Latin letter, a digit, or an emoji,
else DisallowedLabel. Pure Python (no deps), so it runs identically
driver-side, in pandas UDFs, and in the test oracle.
"""

from __future__ import annotations

import unicodedata

_REMOVE = set(" _-'\"." + "’‘")  # incl. underscores and curly apostrophes


class DisallowedLabel(ValueError):
    """Raised when a label contains disallowed characters — the
    engine's analogue of ens-normalize's DisallowedSequence."""


def _is_emoji(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x1F000 <= cp <= 0x1FAFF
        or 0x2600 <= cp <= 0x27BF
        or cp in (0x200D, 0xFE0F)  # ZWJ / variation selector
    )


def _is_latin_letter(ch: str) -> bool:
    if not ch.isalpha():
        return False
    try:
        return "LATIN" in unicodedata.name(ch)
    except ValueError:
        return False


def force_normalize(label: str) -> str:
    """Normalize a member label to its canonical ENS-style form.

    Raises DisallowedLabel on empty results or non-Latin/digit/emoji
    content (mirroring the reference's DisallowedSequence path at
    create_merged.py:199-206).

    With ``NGCS_REAL_LIBS=1`` and ens-normalize + unidecode installed,
    the real reference recipe runs instead (functions/real_adapter.py).
    """
    from namegraph_collections_spark.functions import real_adapter

    if real_adapter.use_real_normalize():
        return real_adapter.force_normalize_real(label)
    s = unicodedata.normalize("NFKC", label).casefold()
    s = "".join(ch for ch in s if ch not in _REMOVE)
    if not s:
        raise DisallowedLabel(f"empty after normalization: {label!r}")
    for ch in s:
        if not (ch.isdigit() or _is_latin_letter(ch) or _is_emoji(ch)):
            raise DisallowedLabel(f"disallowed char {ch!r} in {label!r}")
    return s


def try_force_normalize(label: str) -> str | None:
    """None-returning variant for columnar batch paths."""
    try:
        return force_normalize(label)
    except DisallowedLabel:
        return None
