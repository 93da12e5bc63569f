"""The driver-green rotation set self-updates from CORRECTNESS_r*.json:
the registry must fold every hash-green verdict on disk into the
verification-priority queue without a manual script run (the round-3
failure mode: a stale static set re-verified an already-green window)."""

from __future__ import annotations

import json

from cve_manager_spark.plans import registry


def test_driver_green_is_superset_of_static():
    assert registry.driver_green() >= registry.DRIVER_GREEN


def test_driver_green_reads_new_reports(tmp_path, monkeypatch):
    report = {"some_brand_new_query": {"hash_match": True},
              "not_green": {"hash_match": False}}
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(report))
    # point the repo-root resolution at the temp dir via the module file path
    monkeypatch.setattr(
        registry.os.path, "abspath",
        lambda p: str(tmp_path / "a" / "b" / "registry.py"),
    )
    green = registry.driver_green()
    assert "some_brand_new_query" in green
    assert "not_green" not in green
    assert green >= registry.DRIVER_GREEN


def test_window_prioritizes_unverified():
    """Every oracle-paired spec NOT yet driver-green sorts before any
    already-green spec — the 50-entry driver window always spends its
    budget on fresh verifications first."""
    specs = registry._all_specs()
    green = registry.driver_green()
    tiers = [
        0 if (s.oracle is not None and s.name not in green) else 1
        for s in specs
    ]
    first_green = tiers.index(1) if 1 in tiers else len(tiers)
    assert all(t == 1 for t in tiers[first_green:])


def test_never_sampled_rows_only_specs_outrank_green_rotation():
    """VERDICT r10 #2: a rows-only spec (oracle=None) that has never
    appeared in any CORRECTNESS window sorts ahead of every
    already-green spec — otherwise it starves behind the rotation
    forever and never even gets a rows/err verdict."""
    specs = registry._all_specs()
    green = registry.driver_green()
    seen = registry.driver_seen()
    first_green_idx = next(
        i
        for i, s in enumerate(specs)
        if s.oracle is not None and s.name in green
    )
    unsampled_rows_only = [
        i
        for i, s in enumerate(specs)
        if s.oracle is None and s.name not in seen
    ]
    assert all(i < first_green_idx for i in unsampled_rows_only)
    # and a rows-only spec the driver HAS sampled stops occupying the
    # front of the queue
    sampled_rows_only = [
        i
        for i, s in enumerate(specs)
        if s.oracle is None and s.name in seen
    ]
    assert all(i > first_green_idx for i in sampled_rows_only)
