"""Tests for the code-aware verification rotation (plans/provenance.py +
__spark_entry__._ordered_names).

The rotation exists to fix a concrete round-10 failure: a rewritten
operator (sketches.py) left its queries sorted LAST in the driver's
verification window. These tests pin the properties that make the fix
trustworthy: determinism, def-level precision (unrelated edits don't
trigger), recall (edits anywhere in the reachable closure DO trigger),
and graceful degradation when the sidecar is absent.

No Spark session needed — everything is static file analysis.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import pytest

from consent_based_conversion_adjustments_spark.plans import provenance as P

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pkg_copy(tmp_path_factory):
    root = tmp_path_factory.mktemp("prov")
    shutil.copytree(os.path.join(REPO, P.PKG), os.path.join(root, P.PKG))
    return str(root)


@pytest.fixture(scope="module")
def base_fps(pkg_copy):
    return P.fingerprint_all(pkg_copy)


def _edit(root: str, relpath: str, old: str, new: str) -> str:
    path = os.path.join(root, relpath)
    src = open(path).read()
    assert old in src, f"probe anchor {old!r} missing from {relpath}"
    open(path, "w").write(src.replace(old, new, 1))
    return src


def test_fingerprints_cover_every_registered_query(base_fps):
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    registered = set()
    for registry in E._REGISTRIES:
        registered.update(registry.keys())
    assert registered == set(base_fps)


def test_deterministic(pkg_copy, base_fps):
    assert P.fingerprint_all(pkg_copy) == base_fps


def test_unrelated_def_append_changes_nothing(pkg_copy, base_fps):
    rel = f"{P.PKG}/operators/sketches.py"
    path = os.path.join(pkg_copy, rel)
    orig = open(path).read()
    try:
        open(path, "a").write("\n\ndef _provenance_probe_unused():\n    return 1\n")
        assert P.fingerprint_all(pkg_copy) == base_fps
    finally:
        open(path, "w").write(orig)


def test_operator_def_edit_bumps_exactly_its_queries(pkg_copy, base_fps):
    """The round-10 scenario: editing cms_heavy_hitters must bump the CMS
    queries and nothing else."""
    rel = f"{P.PKG}/operators/sketches.py"
    path = os.path.join(pkg_copy, rel)
    orig = open(path).read()
    m = re.search(r"(def cms_heavy_hitters\([^\n]*\n)", orig)
    assert m is not None
    try:
        open(path, "w").write(
            orig.replace(m.group(1), m.group(1) + "    # probe\n", 1)
        )
        fps = P.fingerprint_all(pkg_copy)
        changed = {q for q in base_fps if fps[q] != base_fps[q]}
        assert changed == {"user_heavy_hitters_cms", "streaming_cms_rounds"}
    finally:
        open(path, "w").write(orig)


def test_registry_helper_edit_bumps_dependents_only(pkg_copy, base_fps):
    """Editing the shared _logreg_feats helper bumps the GLM family that
    consumes it, not unrelated corpus queries."""
    rel = f"{P.PKG}/plans/corpus_queries.py"
    path = os.path.join(pkg_copy, rel)
    orig = open(path).read()
    m = re.search(r"(def _logreg_feats\([^\n]*\n)", orig)
    assert m is not None
    try:
        open(path, "w").write(
            orig.replace(m.group(1), m.group(1) + "    # probe\n", 1)
        )
        fps = P.fingerprint_all(pkg_copy)
        changed = {q for q in base_fps if fps[q] != base_fps[q]}
        assert "doc_logreg_quality" in changed
        assert "doc_classifier_auc" in changed
        assert "tfidf_top_terms" not in changed
        assert "bpe_merges" not in changed
    finally:
        open(path, "w").write(orig)


def test_transitive_cross_module_edit_triggers(pkg_copy, base_fps):
    """dedup.py reaches text.py helpers; editing the string-hash primitive
    must bump the minhash queries through two module hops."""
    rel = f"{P.PKG}/operators/text.py"
    path = os.path.join(pkg_copy, rel)
    orig = open(path).read()
    m = re.search(r"(def string_hash\([^\n]*\n)", orig)
    if m is None:
        pytest.skip("string_hash moved — update the probe anchor")
    try:
        open(path, "w").write(
            orig.replace(m.group(1), m.group(1) + "    # probe\n", 1)
        )
        fps = P.fingerprint_all(pkg_copy)
        changed = {q for q in base_fps if fps[q] != base_fps[q]}
        assert "dedup_minhash" in changed
    finally:
        open(path, "w").write(orig)


def test_decorator_edit_bumps_fingerprints(pkg_copy, base_fps):
    """ADVICE r11: node.lineno of a decorated def/class is the def line,
    so a decorator-only edit (here: @dataclass(frozen=True) →
    frozen=False on FeatureEncoder — a real behavior change) used to
    leave every fingerprint untouched. The segment must start at the
    decorator."""
    rel = f"{P.PKG}/operators/preprocess.py"
    path = os.path.join(pkg_copy, rel)
    orig = open(path).read()
    anchor = "@dataclass(frozen=True)\nclass FeatureEncoder:"
    assert anchor in orig
    try:
        open(path, "w").write(
            orig.replace(
                anchor, "@dataclass(frozen=False)\nclass FeatureEncoder:", 1
            )
        )
        fps = P.fingerprint_all(pkg_copy)
        changed = {q for q in base_fps if fps[q] != base_fps[q]}
        assert "cocoa_knn_adjust" in changed, (
            "decorator edit on FeatureEncoder must bump the cocoa "
            "queries that encode through it"
        )
    finally:
        open(path, "w").write(orig)


def test_ordering_puts_hot_before_stale_and_degrades_gracefully(tmp_path):
    """Synthetic CORRECTNESS + sidecar: a query greened last round whose
    fingerprint then changed must sort before never-verified and before
    older-but-unchanged queries; with no sidecar the ordering falls back
    to round-only without raising."""
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    record_dir = str(tmp_path)
    cur = P.fingerprint_all(REPO)
    names = sorted(cur)[:4]
    hot, stale, fresh, never = names
    json.dump(
        {hot: {"hash_match": True}, stale: {"hash_match": True}},
        open(os.path.join(record_dir, "CORRECTNESS_r01.json"), "w"),
    )
    json.dump(
        {hot: {"hash_match": True}, fresh: {"hash_match": True}},
        open(os.path.join(record_dir, "CORRECTNESS_r02.json"), "w"),
    )
    os.makedirs(os.path.join(record_dir, "tools"), exist_ok=True)
    sidecar = {
        "__meta__": {"latest_round": 2, "prev_round": 1},
        # hot: code changed after its last green (head differs from cur)
        hot: {"round": 2, "fp": "OLD", "fp_head": "OLD", "fp_prev": "OLD"},
        # stale: changed somewhere since r1 but matches head (not hot)
        stale: {
            "round": 1,
            "fp": "ANCIENT",
            "fp_head": cur[stale],
            "fp_prev": cur[stale],
        },
        # fresh: unchanged since its green row
        fresh: {
            "round": 2,
            "fp": cur[fresh],
            "fp_head": cur[fresh],
            "fp_prev": cur[fresh],
        },
    }
    json.dump(sidecar, open(os.path.join(record_dir, "tools", "verify_fp.json"), "w"))
    order = E._ordered_names(record_dir)
    pos = {n: order.index(n) for n in names}
    # hot is in the window; ~221 names here are never-verified (no
    # record at all), so the first-registration floor admits the first
    # _NEVER_FLOOR of them — not necessarily our probe name
    assert pos[hot] < E._DRIVER_WINDOW, "hot-changed must be in the window"
    seen_rounds = E._last_verified_round(record_dir)
    window_never = sum(
        1 for n in order[: E._DRIVER_WINDOW] if seen_rounds.get(n, 0) == 0
    )
    assert window_never >= E._NEVER_FLOOR
    assert pos[never] < pos[stale], "never-verified must beat stale-changed"
    assert pos[hot] < pos[stale], "hot-changed must beat stale-changed"
    # `fresh` is the ONLY tier-3 (unchanged-green) query here, so the
    # r12 tier-3 window reserve must pull it into the driver window even
    # though ~220 never-verified names outrank it tier-wise
    assert pos[fresh] < E._DRIVER_WINDOW, "tier-3 reserve must admit fresh"

    # graceful degradation: no sidecar → round-only ordering, no crash
    os.remove(os.path.join(record_dir, "tools", "verify_fp.json"))
    order2 = E._ordered_names(record_dir)
    assert len(order2) == len(order)
    assert order2.index(never) < order2.index(hot)  # never-verified first


def test_tier3_window_reserve_survives_heavy_registration(tmp_path):
    """VERDICT r11 §Next #2: a heavy-registration round (more tier-0/1/2
    names than the driver window) must still put ≥15 oldest-green
    unchanged queries inside the first _DRIVER_WINDOW slots."""
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    record_dir = str(tmp_path)
    cur = P.fingerprint_all(REPO)
    names = sorted(cur)
    hot_cohort, old_cohort = names[:60], names[60:100]
    # 60 queries greened r2 whose code then changed (tier 0) ...
    json.dump(
        {n: {"hash_match": True} for n in hot_cohort},
        open(os.path.join(record_dir, "CORRECTNESS_r02.json"), "w"),
    )
    # ... and 40 greened r1, unchanged since (tier 3)
    json.dump(
        {n: {"hash_match": True} for n in old_cohort},
        open(os.path.join(record_dir, "CORRECTNESS_r01.json"), "w"),
    )
    os.makedirs(os.path.join(record_dir, "tools"), exist_ok=True)
    sidecar = {"__meta__": {"latest_round": 2, "prev_round": 1}}
    for n in hot_cohort:
        sidecar[n] = {"round": 2, "fp": "OLD", "fp_head": "OLD", "fp_prev": "OLD"}
    for n in old_cohort:
        sidecar[n] = {
            "round": 1, "fp": cur[n], "fp_head": cur[n], "fp_prev": cur[n]
        }
    json.dump(
        sidecar, open(os.path.join(record_dir, "tools", "verify_fp.json"), "w")
    )
    window = E._ordered_names(record_dir)[: E._DRIVER_WINDOW]
    n_old = sum(1 for n in window if n in set(old_cohort))
    assert n_old >= E._DRIVER_WINDOW - E._URGENT_CAP, (
        f"only {n_old} tier-3 queries in the window — the reserve failed"
    )
    # the remaining ~124 registered names have no record at all → tier 1;
    # the first-registration floor grants them _NEVER_FLOOR urgent slots,
    # the hot cohort fills the rest of the cap
    n_hot = sum(1 for n in window if n in set(hot_cohort))
    assert n_hot == E._URGENT_CAP - E._NEVER_FLOOR
    n_never = sum(
        1 for n in window if n not in set(hot_cohort) | set(old_cohort)
    )
    assert n_never == E._NEVER_FLOOR


def test_fingerprints_computable_on_historical_git_tree(tmp_path):
    """The refresh path: fingerprint_all must work on a bare `git
    archive` extraction of a historical commit (no installed package, no
    sys.modules), and produce the same keys the registries had then."""
    import io
    import subprocess
    import tarfile

    proc = subprocess.run(
        ["git", "archive", "HEAD~3", P.PKG],
        cwd=REPO,
        capture_output=True,
    )
    if proc.returncode != 0:
        pytest.skip("shallow history")
    with tarfile.open(fileobj=io.BytesIO(proc.stdout)) as tf:
        tf.extractall(str(tmp_path), filter="data")
    fps = P.fingerprint_all(str(tmp_path))
    assert len(fps) >= 200
    assert all(len(v) == 64 for v in fps.values())
    # deterministic on the archived tree too
    assert fps == P.fingerprint_all(str(tmp_path))
