"""Regression tests for the round-4 advisor findings (ADVICE.md):

1. create_property order comes from a persisted monotonic counter
   (reference next_zero_seq, properties.rs:240-263) — after a DELETE,
   a new property must NOT reuse a live property's columnName.
2. WAL replay truncates a torn tail so records appended AFTER recovery
   are not stranded behind corrupt bytes on the next replay.
3. refresh() only accepts true refresh tokens (typ claim); an access
   token cannot mint new token pairs; a refresh token is not accepted
   as a bearer access token.
4. checkpoint_ingest() drains the in-memory buffers together with the
   WAL — no double-flush of the same rows.
5. restore_backup rejects archive entries absent from the manifest.
"""

from __future__ import annotations

import os
import tarfile

import pytest

from optiprism_spark import auth as auth_mod
from optiprism_spark.catalog import Catalog
from optiprism_spark.wal import IngestWal


# ------------------------------------------- 1. property order counter

def test_property_order_survives_delete():
    cat = Catalog()
    p0 = cat.create_property(1, {"name": "plan", "dataType": "int64"})
    p1 = cat.create_property(1, {"name": "seats", "dataType": "int64"})
    assert (p0["columnName"], p1["columnName"]) == ("e_i64_0", "e_i64_1")
    cat.delete("event_property", p0["id"], 1)
    p2 = cat.create_property(1, {"name": "spend", "dataType": "int64"})
    # len()-derived order would hand out e_i64_1 again, silently
    # aliasing `spend` onto `seats`'s physical column
    assert p2["columnName"] == "e_i64_2"
    live = {p["columnName"] for p in cat.list("event_property", 1)}
    assert len(live) == 2


def test_property_order_counter_persists_and_seeds(tmp_path):
    path = str(tmp_path / "md.db")
    cat = Catalog(path)
    cat.create_property(1, {"name": "a", "dataType": "string"})
    b = cat.create_property(1, {"name": "b", "dataType": "string"})
    cat.delete("event_property", b["id"], 1)
    cat.close()
    # counter survives reopen: next str property continues past b
    cat2 = Catalog(path)
    c = cat2.create_property(1, {"name": "c", "dataType": "string"})
    assert c["columnName"] == "e_str_2"
    # a pre-counter catalog (counter row missing) seeds from max order:
    # simulate by dropping the counter row
    cat2._db.execute("DELETE FROM sequences WHERE kind LIKE 'order:%'")
    cat2._db.commit()
    d = cat2.create_property(1, {"name": "d", "dataType": "string"})
    assert d["columnName"] == "e_str_3"


# ------------------------------------------------ 2. WAL tail truncate

def test_wal_truncates_torn_tail_then_keeps_new_records(tmp_path):
    wal_dir = str(tmp_path / "wal")
    w = IngestWal(wal_dir)
    w.append("track", {"n": 1})
    w.append("track", {"n": 2})
    w.close()
    # crash mid-write: garbage half-record at the tail
    with open(w.path, "ab") as f:
        f.write(b"\x00\x00\x00\x99GARBAGE")

    w2 = IngestWal(wal_dir)
    tracked, _ = w2.replay()
    assert [r["n"] for r in tracked] == [1, 2]
    # post-recovery append must land after VALID data, not after the
    # garbage — the ack-durability contract of the next replay
    w2.append("track", {"n": 3})
    tracked2, _ = w2.replay()
    assert [r["n"] for r in tracked2] == [1, 2, 3]
    w2.close()
    # and a fresh process sees the same thing
    w3 = IngestWal(wal_dir)
    tracked3, _ = w3.replay()
    assert [r["n"] for r in tracked3] == [1, 2, 3]
    w3.close()


# --------------------------------------- 3. refresh-token type binding

def test_refresh_rejects_access_token():
    cat = Catalog()
    pair = auth_mod.sign_up(cat, {"email": "a@b.c", "password": "pw123456"}, "k")
    # an access token must not mint a new pair
    with pytest.raises(auth_mod.AuthError):
        auth_mod.refresh(cat, {"refreshToken": pair["accessToken"]}, "k")
    # a real refresh token does
    fresh = auth_mod.refresh(cat, {"refreshToken": pair["refreshToken"]}, "k")
    claims = auth_mod.parse_token(fresh["refreshToken"], "k")
    assert claims["typ"] == "refresh" and "organizationId" not in claims
    # a legacy typ-less token (pre-upgrade) stays valid for its
    # REMAINING TTL so a deploy doesn't force re-login — but only if
    # its exp proves pre-deploy minting (exp <= deploy + refresh TTL);
    # a typ-less token with an exp no genuine legacy token could carry
    # is a forgery shape and must NOT mint pairs forever
    import time as _time
    from unittest import mock

    # pin the grace window open relative to NOW so both halves run
    # forever (not just until 30 days after the hardcoded deploy epoch)
    deadline = int(_time.time()) + 3600
    with mock.patch.object(auth_mod, "_LEGACY_TYP_DEADLINE", deadline):
        legacy = auth_mod.make_token(
            {"exp": deadline - 10, "accountId": 1}, "k")
        assert "accessToken" in auth_mod.refresh(
            cat, {"refreshToken": legacy}, "k")
        forged = auth_mod.make_token(
            {"exp": deadline + 10, "accountId": 1}, "k")
        with pytest.raises(auth_mod.AuthError):
            auth_mod.refresh(cat, {"refreshToken": forged}, "k")


def test_refresh_token_is_not_a_bearer_token(spark):
    from optiprism_spark.server import make_app
    from .test_server import call

    app = make_app(spark, "/root/testdata/sf0.001", token_key="k")
    pair = auth_mod.sign_up(app.catalog,
                            {"email": "x@y.z", "password": "pw123456"}, "k")
    import io as _io
    environ = {
        "REQUEST_METHOD": "GET", "PATH_INFO": "/api/v1/projects",
        "QUERY_STRING": "", "CONTENT_LENGTH": "0",
        "wsgi.input": _io.BytesIO(b""),
        "HTTP_AUTHORIZATION": f"Bearer {pair['refreshToken']}",
    }
    captured = {}
    app(environ, lambda s, h: captured.setdefault("status", int(s.split()[0])))
    assert captured["status"] == 403


# ----------------------------------------- 4. checkpoint drains buffers

def test_checkpoint_ingest_drains_buffers(spark, tmp_path):
    from optiprism_spark.server import make_app
    from .test_server import call

    app = make_app(spark, "/root/testdata/sf0.001",
                   wal_dir=str(tmp_path / "wal"))
    st, _ = call(app, "POST", "/api/v1/ingest/tok/track",
                 {"userId": "u1", "event": "Buy",
                  "timestamp": "2024-03-01T10:00:00Z"})
    assert st == 201
    tracked, identified = app.checkpoint_ingest()
    assert len(tracked) == 1 and identified == []
    # buffers AND WAL are empty: the next flush re-ingests nothing
    assert app.tracked == [] and app.identified == []
    assert app.wal.replay() == ([], [])


# ------------------------------------- 5. unmanifested backup entries

def test_restore_rejects_unmanifested_entries(tmp_path):
    from optiprism_spark.backup import create_backup, restore_backup

    cat = Catalog()
    cat.create("project", {"name": "demo"})
    bpath = str(tmp_path / "b.tar.gz")
    create_backup(bpath, catalog=cat)

    # tamper: rebuild the archive with an extra, unmanifested file
    tampered = str(tmp_path / "tampered.tar.gz")
    with tarfile.open(bpath, "r:gz") as src, \
            tarfile.open(tampered, "w:gz") as dst:
        for m in src.getmembers():
            dst.addfile(m, src.extractfile(m))
        import io as _io
        evil = b"not in the manifest"
        info = tarfile.TarInfo("wal/evil.bin")
        info.size = len(evil)
        dst.addfile(info, _io.BytesIO(evil))

    with pytest.raises(ValueError, match="not in manifest"):
        restore_backup(tampered, str(tmp_path / "restored"))
    # the untampered archive still restores
    out = restore_backup(bpath, str(tmp_path / "restored2"))
    assert out["catalog"] is not None


# ------------------------------------------------ round-4 verdict nits

def test_events_gen_ids_unique_beyond_1000_sessions(spark):
    """event_id packs (user, session, step) with the ACTUAL
    sessions_per_user multiplier — a literal 1000 silently collided
    past 1000 sessions per user."""
    from optiprism_spark.events_gen import generate_events

    df = generate_events(spark, n_users=2, sessions_per_user=1100)
    total = df.count()
    assert df.select("event_id").distinct().count() == total


def test_io_conf_override_warns(spark):
    """ensure_io_confs stamps session confs loudly: overriding a
    conflicting user timezone produces a visible warning instead of a
    silent mutation (the confs are execution-time, so restoring them
    per-read would corrupt lazy frames)."""
    import warnings as _w

    from optiprism_spark.schema import ensure_io_confs

    ensure_io_confs(spark)  # idempotent: no warning when already UTC
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            ensure_io_confs(spark)
        assert any("overrides" in str(r.message) for r in rec)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        with _w.catch_warnings(record=True) as rec2:
            _w.simplefilter("always")
            ensure_io_confs(spark)
        assert not rec2
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_ivf_near_pairs_max_bucket_guard(spark):
    """A degenerate dense cluster must not drive the IVF pair join
    quadratic: with max_bucket set, oversized centroid buckets are
    dropped whole (same guard as the text-LSH path) while normal
    buckets keep their pairs."""
    import math

    from optiprism_spark.operators.similarity import embedding_near_pairs_ivf

    dim = 8
    # sampled centroids are the lowest-2 ids: id 0 represents the
    # dense cluster, id 1 the normal pair's neighborhood
    rows = [(0, [1.0] + [0.0] * (dim - 1), 0),
            (1, [0.0] * (dim - 1) + [1.0], 1),
            (101, [0.001] * (dim - 1) + [1.0], 1)]
    for i in range(2, 62):  # 60 more near-identical cluster members
        rows.append((i, [1.0] + [0.001 * (i % 7)] * (dim - 1), 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    uncapped = embedding_near_pairs_ivf(emb, threshold=0.95, n_centroids=2)
    capped = embedding_near_pairs_ivf(emb, threshold=0.95, n_centroids=2,
                                      max_bucket=10)
    n_un = uncapped.count()
    assert n_un >= math.comb(61, 2)  # the cluster's quadratic blowup
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert got == {(1, 101)}  # normal bucket survives, oversized dropped whole
