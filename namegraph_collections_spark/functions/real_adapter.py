"""Optional real-library normalization adapter (C4/C5/C14).

The reference's exact semantics come from three external libraries:
ens-normalize (``ens_cure``) + unidecode in ``force_normalize``
(create_merged.py:163-184) and wordninja in ``tokenize_name``
(load_custom_collections.py:125-162). Per SURVEY §7 the engine ships
deterministic stand-ins (functions/normalize.py, functions/tokenize.py)
that carry the reference's golden tests; this adapter lets a
deployment with the real libraries installed opt into reference
behavior without code changes. Parity caveat: the Latin-script
predicate is approximated from stdlib Unicode names (see
``_script_is_latin``), so inputs containing Latin-named combining
marks can diverge from a myunicode-backed reference run.

Opt-in is EXPLICIT: set ``NGCS_REAL_LIBS=1`` in the environment. The
flag (not mere importability) decides, because silently switching
semantics based on what happens to be installed would change query
results between otherwise-identical runs — an engine must be
deterministic about which normalizer a pipeline ran with. When the
flag is set but a library is missing, the stand-in is used for that
function and ``missing()`` reports it.
"""

from __future__ import annotations

import os
import unicodedata


def _try(name: str):
    try:
        return __import__(name)
    except Exception:  # noqa: BLE001 — any import failure → stand-in
        return None


_ens = _try("ens_normalize")
_unidecode = _try("unidecode")
_wordninja = _try("wordninja")


def flag_enabled() -> bool:
    return os.environ.get("NGCS_REAL_LIBS", "").lower() in ("1", "true", "yes")


def use_real_normalize() -> bool:
    return flag_enabled() and _ens is not None and _unidecode is not None


def use_real_wordsplit() -> bool:
    return flag_enabled() and _wordninja is not None


def missing() -> list[str]:
    """Libraries the flag asked for but the environment lacks."""
    if not flag_enabled():
        return []
    out = []
    if _ens is None:
        out.append("ens_normalize")
    if _unidecode is None:
        out.append("unidecode")
    if _wordninja is None:
        out.append("wordninja")
    return out


def _script_is_latin(ch: str) -> bool:
    # Approximation of myunicode.script_of(c) == 'Latin' via the
    # Unicode character NAME (Latin-script letters carry 'LATIN').
    # Known divergence: name-based matching also catches characters
    # whose Script property is Inherited/Common but whose name mentions
    # LATIN (e.g. U+0363 COMBINING LATIN SMALL LETTER A), which the
    # reference predicate would NOT treat as Latin — such combining
    # marks get unidecoded here where the reference keeps them. Exact
    # parity needs the Unicode Script property (regex \p{Script=Latin}
    # or myunicode), neither of which is stdlib.
    try:
        return "LATIN" in unicodedata.name(ch)
    except ValueError:
        return False


def force_normalize_real(label: str) -> str:
    """The reference recipe verbatim (create_merged.py:163-184):
    ens_cure → drop '-'/"'" → unidecode Latin-script chars → re-cure
    when anything changed. Raises the engine's DisallowedLabel when
    ens-normalize rejects the sequence, so callers catch one type in
    both modes."""
    from namegraph_collections_spark.functions.normalize import DisallowedLabel

    try:
        cured = _ens.ens_cure(label)
        step2 = cured.replace("-", "").replace("'", "")
        step3 = "".join(
            _unidecode.unidecode(c, errors="ignore") if _script_is_latin(c) else c
            for c in step2
        )
        if step3 != cured:
            step3 = _ens.ens_cure(step3)
        return step3
    except DisallowedLabel:
        raise
    except Exception as e:
        # Map ONLY ens-normalize's own rejection hierarchy
        # (DisallowedSequence and subclasses) to the engine's
        # DisallowedLabel; genuine runtime faults (TypeError from a
        # broken install, etc.) must propagate, not be silently
        # classified as disallowed labels and dropped by curation.
        dis = getattr(_ens, "DisallowedSequence", None)
        if dis is not None and isinstance(e, dis):
            raise DisallowedLabel(str(e)) from e
        raise


def word_split_real(chunk: str) -> tuple[str, ...]:
    """wordninja.split, the reference's Zipf-cost splitter
    (load_custom_collections.py:150-155)."""
    return tuple(_wordninja.split(chunk))
