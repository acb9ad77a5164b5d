"""C4/C14 adapter: goldens hold in stand-in mode; with NGCS_REAL_LIBS=1
the dispatch routes to the real libraries (faked here, since the
container ships none) and to the genuine ones when installed."""

from __future__ import annotations

import importlib
import sys
import types

import pytest

from namegraph_collections_spark.functions import real_adapter
from namegraph_collections_spark.functions.curation import curate_member
from namegraph_collections_spark.functions.normalize import (
    DisallowedLabel,
    force_normalize,
)
from namegraph_collections_spark.functions.tokenize import dictionary_split, tokenize_name

# The reference goldens (tests/test_wiki_api.py:143-148 + the
# curate_members triple) — must hold in stand-in mode regardless of
# environment.
GOLDENS = [
    # round 12: accented-Latin goldens hold IDENTICALLY in stand-in
    # mode (vendored Latin-1/Extended-A fold) and under the real
    # adapter (unidecode) — VERDICT r11 #6's done-condition
    ("Adolfo Pérez Esquivel", "adolfoperezesquivel"),
    ("Betty Williams", "bettywilliams"),
    ("Łukasz Søren", "lukaszsoren"),
]


def test_standin_goldens(monkeypatch):
    monkeypatch.delenv("NGCS_REAL_LIBS", raising=False)
    for raw, want in GOLDENS:
        assert force_normalize(raw) == want
    with pytest.raises(DisallowedLabel):
        force_normalize("ιοσρβυνγ")
    assert curate_member("Betty Williams (peace activist)") == (
        "bettywilliams",
        ["betty", "williams"],
    )
    assert real_adapter.missing() == []  # flag off → nothing "missing"


def test_flag_without_libs_falls_back(monkeypatch):
    """Flag set but libraries absent: stand-ins still serve, and
    missing() names what the environment lacks."""
    monkeypatch.setenv("NGCS_REAL_LIBS", "1")
    mod = importlib.reload(real_adapter)
    try:
        if mod._ens is None:
            assert not mod.use_real_normalize()
            assert "ens_normalize" in mod.missing()
            for raw, want in GOLDENS:
                assert force_normalize(raw) == want
    finally:
        monkeypatch.delenv("NGCS_REAL_LIBS")
        importlib.reload(real_adapter)


def test_real_mode_dispatch_with_fake_libs(monkeypatch):
    """With the flag on and (fake) libraries importable, dispatch goes
    through the reference recipe: ens_cure → strip -/' → unidecode on
    Latin chars → re-cure; wordninja.split for word splitting."""
    cure_calls = []

    fake_ens = types.ModuleType("ens_normalize")

    def ens_cure(s):
        cure_calls.append(s)
        return s.lower().replace(" ", "")

    fake_ens.ens_cure = ens_cure
    fake_uni = types.ModuleType("unidecode")
    fake_uni.unidecode = lambda c, errors="ignore": {"é": "e"}.get(c, c)
    fake_wn = types.ModuleType("wordninja")
    fake_wn.split = lambda chunk: ["FAKE", chunk]

    monkeypatch.setitem(sys.modules, "ens_normalize", fake_ens)
    monkeypatch.setitem(sys.modules, "unidecode", fake_uni)
    monkeypatch.setitem(sys.modules, "wordninja", fake_wn)
    monkeypatch.setenv("NGCS_REAL_LIBS", "1")
    mod = importlib.reload(real_adapter)
    try:
        assert mod.use_real_normalize() and mod.use_real_wordsplit()
        assert mod.missing() == []
        # é is Latin-script → unidecode applies → changed → re-cured
        assert mod.force_normalize_real("Adolfo Pérez") == "adolfoperez"
        assert cure_calls == ["Adolfo Pérez", "adolfoperez"]
        # force_normalize routes through the adapter under the flag
        assert force_normalize("Hello World") == "helloworld"
        # wordninja path
        assert dictionary_split("captainamerica") == ("FAKE", "captainamerica")
    finally:
        monkeypatch.delenv("NGCS_REAL_LIBS")
        importlib.reload(real_adapter)


@pytest.mark.skipif(
    real_adapter._ens is None or real_adapter._unidecode is None or real_adapter._wordninja is None,
    reason="real libraries not installed in this environment",
)
def test_real_libraries_goldens(monkeypatch):
    """When the genuine libraries exist, the reference goldens hold in
    real mode too (test_wiki_api.py:143-148)."""
    monkeypatch.setenv("NGCS_REAL_LIBS", "1")
    # guard against silently green-on-stand-in: the dispatch must
    # actually be REAL mode, or this leg proves nothing
    assert real_adapter.use_real_normalize()
    assert real_adapter.use_real_wordsplit()
    for raw, want in GOLDENS:
        assert force_normalize(raw) == want
    with pytest.raises(DisallowedLabel):
        force_normalize("ιοσρβυνγ")
    assert curate_member("Betty Williams (peace activist)") == (
        "bettywilliams",
        ["betty", "williams"],
    )
    assert tokenize_name("captainamerica") == ["captain", "america"]
