"""Change-aware certification window (VERDICT r9 item 1).

The mechanical guard: any query whose implementation changed since its
last driver-certified row MUST land inside the 50-row window head.
These tests pin (a) owner derivation incl. transitive imports, (b) the
promotion rule, (c) the ship-time invariant stale ⊆ window, and
(d) refresh_manifest stamping only window entries.
"""

from __future__ import annotations

import inspect
import json

import pytest

from gelly_streaming_spark import certify
from gelly_streaming_spark import queries as Q


def rel(paths):
    return {str(p.relative_to(certify.PKG_ROOT)) for p in paths}


def owners(name: str):
    return rel(certify._owner_modules(inspect.getsource(Q.REGISTRY[name].fn)))


def test_every_query_has_a_fingerprint():
    fps = certify.fingerprints()
    assert set(fps) == set(Q.REGISTRY)
    assert all(
        len(v["self"]) == 64 and len(v["full"]) == 64 for v in fps.values()
    )


def test_owner_derivation_direct_and_transitive():
    # direct: q49 imports ext.web in its body
    assert "ext/web.py" in owners("q49_url_curation")
    # transitive: q31 imports ext.dedup which imports ext.similarity —
    # the r9 miss (jaccard_rep_pairs changed under q31) must be caught
    o31 = owners("q31_near_dup_collapse")
    assert {"ext/dedup.py", "ext/similarity.py"} <= o31
    # top-level-name mapping: q01 uses E./GraphStream from queries.py
    # module scope, not a body import
    assert "sources/edges.py" in owners("q01_scan")


def test_owner_derivation_through_helper_bodies(monkeypatch):
    """r11 review finding: a module referenced only inside a queries.py
    HELPER body must still own the helper's callers — q15b's input is
    built by _q15_edges from sources/edges.py (via the E. name mapping),
    and an edges.py edit previously staled nothing for it."""
    # fingerprints() hashes the decorator-STRIPPED source (r14), so the
    # wiring check below must look for the same def-onward text
    full = inspect.getsource(Q.REGISTRY["q15b_cc_summary"].fn)
    lines = full.splitlines(keepends=True)
    src = "".join(
        lines[next(i for i, ln in enumerate(lines)
                   if ln.lstrip().startswith("def ")):]
    )
    helpers = certify._referenced_helpers(src, "q15b")
    scan = "\n".join([src, *(t for _, k, t in helpers if k == "src")])
    assert "sources/edges.py" in rel(certify._owner_modules(scan))
    # and the fn source ALONE does not reach it (the gap being covered)
    assert "sources/edges.py" not in owners("q15b_cc_summary")
    # guard the WIRING, not a reimplementation: fingerprints() must pass
    # the helper-expanded scan (with _q15_edges' body) to _owner_modules
    # for q15b — reverting to _owner_modules(src) must fail here
    captured: list[str] = []
    orig = certify._owner_modules

    def spy(scan_text):
        captured.append(scan_text)
        return orig(scan_text)

    monkeypatch.setattr(certify, "_owner_modules", spy)
    certify._reset_cache()
    try:
        certify.fingerprints()
        q15b_scans = [s for s in captured if src in s]
        assert q15b_scans, "fingerprints() never scanned q15b's source"
        assert any("def _q15_edges" in s for s in q15b_scans)
        # data constants must NOT be in any owner scan (spurious owners)
        assert not any("_Q31_SQL" == s.strip() for s in captured)
    finally:
        certify._reset_cache()


def test_owner_scan_excludes_data_constants():
    """Import-looking text inside SQL/doc DATA must not add owners: a
    repr-kind helper (string constant) is hashed into `self` but never
    fed to the owner regex scan."""
    helpers = dict(
        (n, (k, t))
        for n, k, t in certify._referenced_helpers(
            "def qX(spark, sf_dir):\n    return _with(_Q15_SQL)\n", "qX"
        )
    )
    assert helpers["_Q15_SQL"][0] == "repr"
    assert helpers["_with"][0] == "src"
    # the E. owner pattern must not fire on attribute chains or words
    # ending in E followed by a dot (r11 review: bare 'E\\.' matched
    # 'NOTE.' in comments)
    assert "sources/edges.py" not in rel(
        certify._owner_modules("x = obj.E.thing  # NOTE. nothing\n")
    )
    assert "sources/edges.py" in rel(
        certify._owner_modules("e = E.edges_events(spark, sf_dir)\n")
    )


def test_helper_set_constants_hash_deterministically():
    """A set/frozenset module constant must canonicalize (raw set repr
    order is PYTHONHASHSEED-randomized -> permanent self-staleness)."""
    s = frozenset({"com", "net", "org", "io"})
    import gelly_streaming_spark.queries as Qm
    try:
        Qm._CERT_TEST_SET = s
        certify._reset_cache()
        kind, text = certify._helper_sources()["_CERT_TEST_SET"]
        assert kind == "repr"
        assert text == repr(sorted(s, key=repr))
    finally:
        del Qm._CERT_TEST_SET
        certify._reset_cache()


def test_infra_modules_excluded_from_owners():
    for name in ("q01_scan", "q31_near_dup_collapse", "q49_url_curation"):
        assert not owners(name) & certify._INFRA_EXCLUDE


def test_fingerprint_covers_oracle_sql(monkeypatch):
    fps_before = {n: dict(v) for n, v in certify.fingerprints().items()}
    q = Q.REGISTRY["q01_scan"]
    monkeypatch.setattr(q, "sql", (q.sql or "") + " -- changed")
    certify._reset_cache()
    try:
        after = certify.fingerprints()["q01_scan"]
        # an oracle-SQL edit is a SELF change (band 0), not owner-stale
        assert after["self"] != fps_before["q01_scan"]["self"]
        assert after["full"] != fps_before["q01_scan"]["full"]
    finally:
        certify._reset_cache()


def test_helper_edit_self_stales_exactly_its_callers(monkeypatch):
    """r10 verdict item 2: a queries.py module-level helper edit must
    SELF-stale exactly the queries whose fn bodies reference it —
    previously such an edit escaped the fingerprint entirely."""
    baseline = {n: dict(v) for n, v in certify.fingerprints().items()}
    orig = Q._q15_edges

    def _q15_edges(spark, sf_dir):
        return orig(spark, sf_dir)  # semantically same, source differs

    _q15_edges.__module__ = Q.__name__
    monkeypatch.setattr(Q, "_q15_edges", _q15_edges)
    certify._reset_cache()
    try:
        after = certify.fingerprints()
        changed = {n for n in after if after[n]["self"] != baseline[n]["self"]}
        # independent expectation: direct textual reference in fn source
        expected = {
            n for n, q in Q.REGISTRY.items()
            if "_q15_edges" in inspect.getsource(q.fn)
        }
        assert expected, "fixture rot: no query references _q15_edges"
        assert changed == expected
        assert "q01_scan" not in changed
    finally:
        certify._reset_cache()


def test_helper_chain_is_transitive(monkeypatch):
    """fn → helper A → helper B: editing B stales the fn."""
    def _cert_helper_b():
        return 1

    def _cert_helper_a():
        return _cert_helper_b()

    for h in (_cert_helper_a, _cert_helper_b):
        h.__module__ = Q.__name__
    monkeypatch.setattr(Q, "_cert_helper_a", _cert_helper_a, raising=False)
    monkeypatch.setattr(Q, "_cert_helper_b", _cert_helper_b, raising=False)
    certify._reset_cache()
    try:
        fn_src = "def qX(spark, sf_dir):\n    return _cert_helper_a()\n"
        refs = {n for n, _k, _t in certify._referenced_helpers(fn_src, "qX")}
        assert refs >= {"_cert_helper_a", "_cert_helper_b"}
    finally:
        certify._reset_cache()


def test_helper_sources_skip_address_bearing_reprs():
    helpers = certify._helper_sources()
    # REGISTRY holds function objects -> repr has addresses -> skipped
    assert "REGISTRY" not in helpers
    # plain-data constants and Q-defined functions are captured
    assert "_VIEW_SQL" in helpers
    assert "_q15_edges" in helpers
    for kind, text in helpers.values():
        assert kind in ("src", "repr") and " at 0x" not in text


def test_self_stale_query_heads_the_window(monkeypatch, tmp_path):
    # synthetic manifest: everything current EXCEPT one long-stable
    # extension row that the static list keeps outside the window
    fps = {n: dict(v) for n, v in certify.fingerprints().items()}
    victim = "q43_minhash_lsh"
    assert Q._CERT_ORDER.index(victim) >= certify.WINDOW - 5
    manifest = {n: dict(v) for n, v in fps.items()}
    # its own body changed post-cert -> band 0, ahead of everything
    manifest[victim]["self"] = "0" * 64
    manifest[victim]["full"] = "0" * 64
    mp = tmp_path / "m.json"
    mp.write_text(json.dumps(manifest))
    monkeypatch.setattr(certify, "MANIFEST_PATH", mp)
    order = Q._export_order()
    assert order[0] == victim, "self-changed query must head the window"


def test_owner_stale_ranks_between_self_stale_and_fresh(monkeypatch, tmp_path):
    fps = {n: dict(v) for n, v in certify.fingerprints().items()}
    manifest = {n: dict(v) for n, v in fps.items()}
    owner_victim = "q43_minhash_lsh"   # shared module changed underneath
    self_victim = "q44_simhash_pairs"  # own body changed
    manifest[owner_victim]["full"] = "0" * 64
    manifest[self_victim]["self"] = "0" * 64
    manifest[self_victim]["full"] = "0" * 64
    mp = tmp_path / "m.json"
    mp.write_text(json.dumps(manifest))
    monkeypatch.setattr(certify, "MANIFEST_PATH", mp)
    order = Q._export_order()
    assert order[0] == self_victim
    assert order[1] == owner_victim
    assert certify.self_stale_queries() == {self_victim}
    assert certify.stale_queries() == {self_victim, owner_victim}


def test_new_query_sorts_stale(monkeypatch, tmp_path):
    mp = tmp_path / "m.json"
    mp.write_text(json.dumps(certify.fingerprints()))
    monkeypatch.setattr(certify, "MANIFEST_PATH", mp)
    fake = Q.Query(fn=Q.REGISTRY["q01_scan"].fn, sql=None, doc="")
    monkeypatch.setitem(Q.REGISTRY, "q99_brand_new", fake)
    certify._reset_cache()
    try:
        order = Q._export_order()
        assert "q99_brand_new" in order[: certify.WINDOW]
    finally:
        certify._reset_cache()


def test_ship_invariant_self_stale_within_window():
    """The invariant the driver relies on: every SELF-stale query (own
    body/SQL changed, or never certified) sits inside the first-50
    export window. If this fails mid-development you have more
    changed-uncertified queries than window slots — split the
    certification across rounds deliberately instead of silently.
    Owner-stale rows (a shared module changed underneath them) MAY
    overflow the window; they keep their old manifest entries and
    rotate in next round — that is the designed behavior when an
    every-query owner like sources/tables.py changes."""
    urgent = certify.self_stale_queries()
    window = set(Q._export_order()[: certify.WINDOW])
    assert urgent <= window, f"self-stale outside window: {sorted(urgent - window)}"


def test_export_order_age_beats_owner_staleness(monkeypatch):
    """Freshness contract (VERDICT r13 item 6): a FRESH query whose
    evidence is ≥2 rounds old joins the needs-recert band and outranks
    owner-stale rows with newer evidence — a wide owner-module change
    must not starve the oldest-evidence rows out of the window (the
    r14 registration-plumbing change would have ridden q22/q30 on r12
    evidence through r14 otherwise)."""
    names = list(Q.REGISTRY)
    old_fresh, newer_owner_stale = names[0], names[1]
    rounds = {n: 13 for n in names}
    rounds[old_fresh] = 12          # fresh, but 2 rounds old at r14
    monkeypatch.setattr(
        "gelly_streaming_spark.certify.self_stale_queries", lambda: set()
    )
    monkeypatch.setattr(
        "gelly_streaming_spark.certify.stale_queries",
        lambda: {newer_owner_stale},
    )
    monkeypatch.setattr(
        "gelly_streaming_spark.certify.certified_rounds", lambda: rounds
    )
    order = Q._export_order()
    assert order.index(old_fresh) < order.index(newer_owner_stale), (
        "round-12 fresh evidence must claim a slot before round-13 "
        "owner-stale rows"
    )


def test_stamp_from_correctness_stamps_only_green_rows(monkeypatch, tmp_path):
    mp = tmp_path / "m.json"
    mp.write_text("{}")
    monkeypatch.setattr(certify, "MANIFEST_PATH", mp)
    rows = {
        "q01_scan": {"rows_match": True, "schema_match": True,
                     "hash_match": True, "err": None},
        "q02_reverse": {"rows_match": True, "schema_match": True,
                        "hash_match": False, "err": None},  # red
        "q03_undirected": {"rows_match": True, "schema_match": True,
                           "hash_match": True, "err": "boom"},  # errored
        "q99_gone": {"rows_match": True, "schema_match": True,
                     "hash_match": True, "err": None},  # not registered
        "q04_filter_edges": {"rows_match": True, "schema_match": True,
                             "err": None},  # hash verification never ran
        "q05_filter_vertices": {"rows_match": True, "schema_match": True,
                                "hash_match": None, "err": None},  # ditto
    }
    cp = tmp_path / "CORRECTNESS_r42.json"
    cp.write_text(json.dumps(rows))
    stamped = certify.stamp_from_correctness(str(cp))
    manifest = json.loads(mp.read_text())
    assert stamped == ["q01_scan"]
    assert set(manifest) == {"q01_scan"}
    fp = certify.fingerprints()["q01_scan"]
    assert manifest["q01_scan"] == {**fp, "round": 42}


def test_fresh_band_rotates_by_evidence_age(monkeypatch, tmp_path):
    """With more registered queries than window slots, the FRESH band
    must order by stamped round (oldest evidence first) — otherwise the
    same static-tier tail rotates out round after round and its
    evidence goes arbitrarily stale (the r10->r12 q20b/q22/q24/q30/
    q32/q34 near-miss)."""
    fps = {n: dict(v) for n, v in certify.fingerprints().items()}
    manifest = {n: {**v, "round": 11} for n, v in fps.items()}
    # one query stamped long ago, one stamped last round, both fresh;
    # pick names the static list ranks LAST and FIRST respectively so
    # age must override the static order to pass
    old_name = Q._CERT_ORDER[-1]
    manifest[old_name]["round"] = 9
    mp = tmp_path / "m.json"
    mp.write_text(json.dumps(manifest))
    monkeypatch.setattr(certify, "MANIFEST_PATH", mp)
    order = Q._export_order()
    assert not certify.stale_queries(), "fixture must be all-fresh"
    assert order[0] == old_name, "oldest evidence must head the fresh band"
    # entries without a round field read as 0 (maximally old)
    del manifest[old_name]["round"]
    mp.write_text(json.dumps(manifest))
    assert Q._export_order()[0] == old_name


def test_oracle_and_query_key_sets_unchanged():
    # queries()/oracle_sql() expose the same registry regardless of order
    qs = Q.queries()
    assert set(qs) == set(Q.REGISTRY)
    assert set(Q.oracle_sql()) <= set(qs)
