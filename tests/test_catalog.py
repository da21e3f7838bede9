"""Metadata catalog, auth, and durable-ingest tests.

Covers the reference's admin plane re-expressed over sqlite
(catalog.py ≙ metadata/src/*, RocksDB namespaces), JWT auth
(auth.py ≙ platform/src/auth), the WAL-backed ingest journal
(wal.py ≙ storage/src/db.rs:214-265), and the end-to-end admin loop:
create a property / custom event through HTTP CRUD, then query on it.
"""

from __future__ import annotations

import io
import json
import os

import pytest

from optiprism_spark import auth as auth_mod
from optiprism_spark.catalog import Catalog, Conflict, NotFound
from optiprism_spark.server import make_app
from optiprism_spark.wal import IngestWal

from .test_server import SF_DIR, T_JAN, call, _col


# ------------------------------------------------------------- catalog core

def test_catalog_crud_roundtrip(tmp_path):
    cat = Catalog(str(tmp_path / "md.db"))
    p = cat.create("project", {"name": "demo"})
    assert p["id"] == 1 and p["createdAt"]
    assert cat.get("project", 1) == p
    assert cat.get_by_name("project", "demo")["id"] == 1
    p2 = cat.update("project", 1, {"name": "demo2", "sessionDurationSeconds": 900})
    assert p2["name"] == "demo2" and p2["updatedAt"]
    assert cat.list("project") == [p2]
    with pytest.raises(Conflict):
        cat.create("project", {"name": "demo2"})
    cat.delete("project", 1)
    with pytest.raises(NotFound):
        cat.get("project", 1)


def test_catalog_persistence_across_reopen(tmp_path):
    """The durability contract of the reference's RocksDB store: state
    survives process restart."""
    path = str(tmp_path / "md.db")
    cat = Catalog(path)
    cat.create("event", {"name": "purchase"}, project_id=1)
    cat.create_property(1, {"name": "plan", "dataType": "string"})
    cat.close()

    cat2 = Catalog(path)
    assert cat2.get_by_name("event", "purchase", project_id=1)["id"] == 1
    prop = cat2.get_by_name("event_property", "plan", project_id=1)
    assert prop["dataType"] == "string"
    # id sequence continues, no reuse
    e2 = cat2.create("event", {"name": "refund"}, project_id=1)
    assert e2["id"] == 2


def test_property_column_name_protocol():
    """Property::column_name() (reference properties.rs:609-632):
    system properties snake_case their name; user properties get
    e_{dtype_short}_{order} with a per-dtype order counter."""
    cat = Catalog()
    sys_p = cat.create_property(1, {"name": "event_type", "dataType": "string"})
    assert sys_p["isSystem"] and sys_p["columnName"] == "event_type"
    s0 = cat.create_property(1, {"name": "plan", "dataType": "string"})
    s1 = cat.create_property(1, {"name": "tier", "dataType": "string"})
    d0 = cat.create_property(1, {"name": "spend", "dataType": "decimal"})
    assert not s0["isSystem"]
    # order counts per (type, dtype): event_type took str order 0
    assert s0["columnName"] == "e_str_1"
    assert s1["columnName"] == "e_str_2"
    assert d0["columnName"] == "e_dec_0"
    g = cat.create_property(1, {"name": "industry", "dataType": "string"},
                            typ="group", group_id=2)
    assert g["columnName"] == "g_2_str_0"
    # dtype validation
    from optiprism_spark.catalog import CatalogError

    with pytest.raises(CatalogError):
        cat.create_property(1, {"name": "bad", "dataType": "float128"})


def test_property_resolution_and_dtypes():
    cat = Catalog()
    cat.create_property(1, {"name": "ts", "dataType": "timestamp"})
    cat.create_property(1, {"name": "k", "dataType": "int64"})
    ref = cat.resolve_property(1, "ts")
    assert ref.kind.value == "column"
    ref = cat.resolve_property(1, "k")
    assert ref.kind.value == "json" and ref.dtype == "int64"
    assert cat.properties_dtypes(1) == {"k": "int64"}


def test_custom_events_map():
    cat = Catalog()
    ce = cat.create(
        "custom_event",
        {"name": "engagement", "events": [
            {"eventName": "view", "eventType": "regular"},
            {"eventName": "click", "eventType": "regular"},
        ]},
        project_id=1,
    )
    m = cat.custom_events_map(1)
    assert m[ce["id"]] == m["engagement"] and len(m["engagement"]) == 2


# ---------------------------------------------------------------- auth unit

def test_jwt_roundtrip_and_tamper():
    tok = auth_mod.make_access_token(7, 1, "k1")
    claims = auth_mod.parse_token(tok, "k1")
    assert claims["accountId"] == 7 and claims["organizationId"] == 1
    with pytest.raises(auth_mod.AuthError):
        auth_mod.parse_token(tok, "other-key")
    with pytest.raises(auth_mod.AuthError):
        auth_mod.parse_token(tok[:-4] + "AAAA", "k1")
    expired = auth_mod.make_access_token(7, 1, "k1", ttl_s=-10)
    with pytest.raises(auth_mod.AuthError):
        auth_mod.parse_token(expired, "k1")


def test_password_hash():
    h = auth_mod.make_password_hash("s3cret-enough")
    assert auth_mod.verify_password("s3cret-enough", h)
    assert not auth_mod.verify_password("wrong", h)
    # salted: two hashes of the same password differ
    assert h != auth_mod.make_password_hash("s3cret-enough")


# ------------------------------------------------------------------ WAL unit

def test_wal_append_replay_truncate(tmp_path):
    wal = IngestWal(str(tmp_path))
    wal.append("track", {"event_type": "a", "user_id": "u1"})
    wal.append("identify", {"group": "user", "id": "u1"})
    wal.append("track", {"event_type": "b", "user_id": "u2"})
    tracked, identified = IngestWal(str(tmp_path)).replay()
    assert [r["event_type"] for r in tracked] == ["a", "b"]
    assert identified == [{"group": "user", "id": "u1"}]
    wal.truncate()
    assert IngestWal(str(tmp_path)).replay() == ([], [])


def test_wal_torn_tail_recovery(tmp_path):
    """A crash mid-write leaves a torn record; recovery keeps every
    acked record and drops the unacked tail (reference WAL rule)."""
    wal = IngestWal(str(tmp_path))
    wal.append("track", {"event_type": "a"})
    wal.append("track", {"event_type": "b"})
    with open(wal.path, "ab") as f:
        f.write(b"\x00\x00\x00\xffgarbage")  # torn: length says 255, payload 7B
    tracked, _ = IngestWal(str(tmp_path)).replay()
    assert [r["event_type"] for r in tracked] == ["a", "b"]


# --------------------------------------------------------- HTTP admin plane

@pytest.fixture()
def app(spark):
    return make_app(spark, SF_DIR)


def test_http_crud_properties_and_events(app):
    st, ev = call(app, "POST", "/api/v1/projects/1/schema/events",
                  {"name": "purchase", "displayName": "Purchase"})
    assert st == 201 and ev["id"] == 1
    st, got = call(app, "GET", "/api/v1/projects/1/schema/events/name/purchase")
    assert st == 200 and got["id"] == 1
    st, lst = call(app, "GET", "/api/v1/projects/1/schema/events")
    assert st == 200 and len(lst) == 1
    st, upd = call(app, "PUT", "/api/v1/projects/1/schema/events/1",
                   {"displayName": "Purchase!"})
    assert st == 200 and upd["displayName"] == "Purchase!"
    st, _ = call(app, "DELETE", "/api/v1/projects/1/schema/events/1")
    assert st == 200
    st, _ = call(app, "GET", "/api/v1/projects/1/schema/events/1")
    assert st == 404

    st, prop = call(app, "POST", "/api/v1/projects/1/schema/event-properties",
                    {"name": "plan", "dataType": "string"})
    assert st == 201 and prop["columnName"] == "e_str_0"
    st, dup = call(app, "POST", "/api/v1/projects/1/schema/event-properties",
                   {"name": "plan", "dataType": "string"})
    assert st == 409
    st, bad = call(app, "POST", "/api/v1/projects/1/schema/event-properties",
                   {"name": "x", "dataType": "float128"})
    assert st == 400
    st, gp = call(app, "POST",
                  "/api/v1/projects/1/schema/group-properties/2",
                  {"name": "industry", "dataType": "string", "groupId": 2})
    assert st == 201 and gp["columnName"] == "g_2_str_0"


def test_http_dashboards_reports_bookmarks(app):
    st, rep = call(app, "POST", "/api/v1/projects/1/reports",
                   {"name": "weekly kpis", "type": "eventSegmentation",
                    "query": {"intervalUnit": "day"}})
    assert st == 201
    st, dash = call(app, "POST", "/api/v1/projects/1/dashboards",
                    {"name": "main", "panels": [
                        {"type": "report", "reportId": rep["id"],
                         "x": 0, "y": 0, "w": 6, "h": 4}]})
    assert st == 201
    st, got = call(app, "GET", f"/api/v1/projects/1/dashboards/{dash['id']}")
    assert st == 200 and got["panels"][0]["reportId"] == rep["id"]
    st, bm = call(app, "POST", "/api/v1/projects/1/bookmarks",
                  {"name": "q", "query": {"foo": 1}})
    assert st == 201
    st, got = call(app, "GET", f"/api/v1/projects/1/bookmarks/{bm['id']}")
    assert st == 200
    # organizations + projects (unscoped collections)
    st, org = call(app, "POST", "/api/v1/organizations", {"name": "acme"})
    assert st == 201
    st, proj = call(app, "POST", "/api/v1/projects", {"name": "demo"})
    assert st == 201
    st, lst = call(app, "GET", "/api/v1/projects")
    assert st == 200 and [p["name"] for p in lst] == ["demo"]


def test_admin_loop_create_property_then_query(app):
    """The reference's core admin loop: create a property through the
    CRUD API, then filter/break down on it in the very next query —
    the catalog's declared dtype (int64) drives the JSON cast, not
    literal inference (a string-literal filter would otherwise
    mis-cast)."""
    st, _ = call(app, "POST", "/api/v1/projects/1/schema/event-properties",
                 {"name": "k", "dataType": "int64"})
    assert st == 201
    body = {
        "time": T_JAN, "group": "user", "intervalUnit": "day",
        "chartType": "line",
        "events": [{
            "eventName": None, "eventType": "regular",
            "queries": [{"type": "countEvents"}],
            "filters": [{"type": "property", "propertyType": "event",
                         "propertyName": "k", "operation": "gte",
                         "value": [50]}],
        }],
    }
    st, payload = call(
        app, "POST", "/api/v1/projects/1/queries/event-segmentation", body)
    assert st == 200
    n = sum(_col(payload, "0_0_count_events")["data"])
    assert n > 0
    # same body in a project with no such property: inference still
    # resolves it (back-compat path), results equal for int literals
    st2, payload2 = call(
        app, "POST", "/api/v1/projects/2/queries/event-segmentation", body)
    assert st2 == 200
    assert sum(_col(payload2, "0_0_count_events")["data"]) == n


def test_admin_loop_custom_event_then_query(app):
    st, ce = call(app, "POST", "/api/v1/projects/1/schema/custom-events",
                  {"name": "engagement", "events": [
                      {"eventName": "view", "eventType": "regular"},
                      {"eventName": "click", "eventType": "regular"},
                  ]})
    assert st == 201
    body = {
        "time": T_JAN, "group": "user", "intervalUnit": "day",
        "chartType": "line",
        "events": [{"eventType": "custom", "eventId": ce["id"],
                    "queries": [{"type": "countEvents"}]}],
    }
    st, payload = call(
        app, "POST", "/api/v1/projects/1/queries/event-segmentation", body)
    assert st == 200
    assert sum(_col(payload, "0_0_count_events")["data"]) > 0


def test_report_save_rerun_same_frame(app):
    """Report persistence loop: save a query body as a report, reload
    it from the catalog, re-run — identical response."""
    body = {
        "time": T_JAN, "group": "user", "intervalUnit": "day",
        "chartType": "line",
        "events": [{"eventName": "purchase", "eventType": "regular",
                    "queries": [{"type": "countEvents"}]}],
    }
    st, first = call(
        app, "POST", "/api/v1/projects/1/queries/event-segmentation", body)
    assert st == 200
    st, rep = call(app, "POST", "/api/v1/projects/1/reports",
                   {"name": "purchases", "type": "eventSegmentation",
                    "query": body})
    assert st == 201
    st, loaded = call(app, "GET", f"/api/v1/projects/1/reports/{rep['id']}")
    assert st == 200
    st, second = call(
        app, "POST", "/api/v1/projects/1/queries/event-segmentation",
        loaded["query"])
    assert st == 200 and second == first


# ----------------------------------------------------------------- auth e2e

def test_auth_enforced_routes(spark):
    app = make_app(spark, SF_DIR, token_key="test-key")
    # no token → 401 on query and admin routes
    st, _ = call(app, "GET", "/api/v1/projects/1/schema/events")
    assert st == 401
    st, _ = call(app, "POST", "/api/v1/projects/1/queries/funnel", {})
    assert st == 401
    # ingest stays token-in-path (reference ingester auth model)
    st, _ = call(app, "POST", "/api/v1/ingest/tok/track",
                 {"event": "x", "userId": "u"})
    assert st == 201

    st, pair = call(app, "POST", "/api/v1/auth/signup",
                    {"email": "a@b.c", "password": "hunter2hunter2"})
    assert st == 200 and "accessToken" in pair
    # duplicate signup → 401 (reference: conflict surfaced via auth error)
    st, _ = call(app, "POST", "/api/v1/auth/signup",
                 {"email": "a@b.c", "password": "x"})
    assert st == 401
    st, pair2 = call(app, "POST", "/api/v1/auth/login",
                     {"email": "a@b.c", "password": "hunter2hunter2"})
    assert st == 200
    st, _ = call(app, "POST", "/api/v1/auth/login",
                 {"email": "a@b.c", "password": "wrong"})
    assert st == 401

    def authed(method, path, body=None):
        raw = b"" if body is None else json.dumps(body).encode()
        environ = {
            "REQUEST_METHOD": method, "PATH_INFO": path, "QUERY_STRING": "",
            "CONTENT_LENGTH": str(len(raw)), "wsgi.input": io.BytesIO(raw),
            "HTTP_AUTHORIZATION": f"Bearer {pair2['accessToken']}",
        }
        captured = {}

        def sr(status, headers):
            captured["status"] = int(status.split()[0])

        chunks = b"".join(app(environ, sr))
        return captured["status"], json.loads(chunks) if chunks else None

    st, ev = authed("POST", "/api/v1/projects/1/schema/events", {"name": "e1"})
    assert st == 201
    st, lst = authed("GET", "/api/v1/projects/1/schema/events")
    assert st == 200 and len(lst) == 1
    # a refresh token is NOT an access token → 403
    environ = {
        "REQUEST_METHOD": "GET", "PATH_INFO": "/api/v1/projects/1/schema/events",
        "QUERY_STRING": "", "CONTENT_LENGTH": "0",
        "wsgi.input": io.BytesIO(b""),
        "HTTP_AUTHORIZATION": f"Bearer {pair2['refreshToken']}",
    }
    captured = {}
    app(environ, lambda s, h: captured.update(status=int(s.split()[0])))
    assert captured["status"] == 403
    # refresh flow issues a fresh pair
    st, pair3 = call(app, "POST", "/api/v1/auth/refresh-token",
                     {"refreshToken": pair2["refreshToken"]})
    assert st == 200 and "accessToken" in pair3


# ------------------------------------------------------------- WAL e2e

def test_ingest_wal_survives_restart(spark, tmp_path):
    """Kill the app (drop the object), recreate it over the same
    wal_dir: the replayed buffers equal the pre-crash state and
    tracked_df produces the same frame."""
    wal_dir = str(tmp_path / "wal")
    app1 = make_app(spark, SF_DIR, wal_dir=wal_dir)
    track = {"userId": "u-1", "event": "Buy", "timestamp": "2024-02-01T10:00:00Z",
             "properties": {"revenue": 5.5},
             "context": {"ip": "8.8.8.8", "page": {"path": "/x"}}}
    st, _ = call(app1, "POST", "/api/v1/ingest/tok/track", track)
    assert st == 201
    st, _ = call(app1, "POST", "/api/v1/ingest/tok/identify",
                 {"group": "user", "id": "u-1", "properties": {"plan": "pro"}})
    assert st == 201
    before_tracked = list(app1.tracked)
    before_rows = app1.tracked_df(enrich=False).collect()
    del app1  # crash

    app2 = make_app(spark, SF_DIR, wal_dir=wal_dir)
    assert app2.tracked == before_tracked
    assert app2.identified_df().collect()[0]["id"] == "u-1"
    assert app2.tracked_df(enrich=False).collect() == before_rows
    # flush → truncate → restart: buffers start empty
    app2.checkpoint_ingest()
    app3 = make_app(spark, SF_DIR, wal_dir=wal_dir)
    assert app3.tracked == [] and app3.identified == []


# ------------------------------------------------- response-size guard

def test_response_size_guard(spark):
    from optiprism_spark.schema import load_table
    from optiprism_spark.server import HttpError, frame_to_response

    events = load_table(spark, SF_DIR, "events")
    with pytest.raises(HttpError) as ei:
        frame_to_response(events, max_rows=10)
    assert ei.value.status == 500 and "exceeds" in ei.value.message
    out = frame_to_response(events.limit(5), max_rows=10)
    assert len(out["columns"][0]["data"]) == 5


# ------------------------------------------------------- backup/restore

def test_backup_restore_roundtrip(spark, tmp_path):
    """Full store backup/restore (reference storage/src/db.rs:
    1348-1546): catalog + WAL + a parquet data dir archived with
    sha256 manifest; restore verifies integrity and state equals the
    pre-backup snapshot even after post-backup mutations."""
    from optiprism_spark.backup import create_backup, restore_backup

    cat = Catalog(str(tmp_path / "md.db"))
    cat.create("project", {"name": "demo"})
    cat.create_property(1, {"name": "plan", "dataType": "string"})
    wal_dir = str(tmp_path / "wal")
    wal = IngestWal(wal_dir)
    wal.append("track", {"event_type": "a", "user_id": "u1"})
    data_dir = str(tmp_path / "events_data")
    spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string") \
        .write.parquet(data_dir)

    out = str(tmp_path / "bk" / "backup-1.tar.gz")
    manifest = create_backup(out, catalog=cat, wal_dir=wal_dir,
                             data_dirs={"events": data_dir})
    assert "catalog.db" in manifest["entries"]
    assert any(e.startswith("wal/") for e in manifest["entries"])

    # post-backup mutations that the restore must NOT see
    cat.create("project", {"name": "after-backup"})
    wal.append("track", {"event_type": "b", "user_id": "u2"})

    dest = str(tmp_path / "restored")
    r = restore_backup(out, dest)
    rcat = Catalog(r["catalog"])
    assert [p["name"] for p in rcat.list("project")] == ["demo"]
    assert rcat.properties_dtypes(1) == {"plan": "string"}
    tracked, _ = IngestWal(r["wal_dir"]).replay()
    assert [t["event_type"] for t in tracked] == ["a"]
    rows = spark.read.parquet(r["data_dirs"]["events"]).orderBy("id").collect()
    assert [(x.id, x.v) for x in rows] == [(1, "x"), (2, "y")]


def test_backup_integrity_check(tmp_path):
    import tarfile

    from optiprism_spark.backup import create_backup, restore_backup

    cat = Catalog()
    cat.create("project", {"name": "p"})
    out = str(tmp_path / "b.tar.gz")
    create_backup(out, catalog=cat)
    # corrupt the archived catalog, keep the manifest: restore must fail
    evil = str(tmp_path / "evil.tar.gz")
    with tarfile.open(out, "r:gz") as src, tarfile.open(evil, "w:gz") as dst:
        for m in src.getmembers():
            data = src.extractfile(m).read()
            if m.name == "catalog.db":
                # XOR-flip so the corruption is real regardless of what
                # the file happens to end with (sqlite pads with zeros)
                data = data[:-4] + bytes(b ^ 0xFF for b in data[-4:])
            import io as _io
            info = tarfile.TarInfo(m.name)
            info.size = len(data)
            dst.addfile(info, _io.BytesIO(data))
    with pytest.raises(ValueError, match="integrity"):
        restore_backup(evil, str(tmp_path / "r"))


def test_backup_http_routes(spark, tmp_path):
    wal_dir = str(tmp_path / "wal")
    app = make_app(spark, SF_DIR, wal_dir=wal_dir)
    st, _ = call(app, "POST", "/api/v1/ingest/tok/track",
                 {"event": "x", "userId": "u"})
    assert st == 201
    st, created = call(app, "POST", "/api/v1/admin/backups", {})
    assert st == 201 and created["entries"] >= 2  # catalog + wal
    st, lst = call(app, "GET", "/api/v1/admin/backups")
    assert st == 200 and len(lst) == 1
    # second backup must not recursively archive the first
    st, c2 = call(app, "POST", "/api/v1/admin/backups", {})
    assert st == 201 and c2["entries"] == created["entries"]
    # no backup_dir configured -> 400
    app2 = make_app(spark, SF_DIR)
    st, _ = call(app2, "POST", "/api/v1/admin/backups", {})
    assert st == 400


def test_accounts_and_groups_routes(spark):
    app = make_app(spark, SF_DIR, token_key="k")
    st, pair = call(app, "POST", "/api/v1/auth/signup",
                    {"email": "x@y.z", "password": "pw-pw-pw-pw"})
    assert st == 200

    def authed(method, path, body=None):
        raw = b"" if body is None else json.dumps(body).encode()
        environ = {
            "REQUEST_METHOD": method, "PATH_INFO": path, "QUERY_STRING": "",
            "CONTENT_LENGTH": str(len(raw)), "wsgi.input": io.BytesIO(raw),
            "HTTP_AUTHORIZATION": f"Bearer {pair['accessToken']}",
        }
        captured = {}
        chunks = b"".join(app(environ, lambda s, h: captured.update(
            status=int(s.split()[0]))))
        return captured["status"], json.loads(chunks) if chunks else None

    st, accounts = authed("GET", "/api/v1/accounts")
    assert st == 200 and len(accounts) == 1
    # password hash never leaves through CRUD (reference DTO omits it)
    assert "passwordHash" not in accounts[0]
    st, one = authed("GET", f"/api/v1/accounts/{accounts[0]['id']}")
    assert st == 200 and "passwordHash" not in one
    st, g = authed("POST", "/api/v1/projects/1/groups", {"name": "company"})
    assert st == 201
    st, gl = authed("GET", "/api/v1/projects/1/groups")
    assert st == 200 and [x["name"] for x in gl] == ["company"]


# ---------------------------------------------------- materialization

def test_materialize_property_compaction_roundtrip(spark, tmp_path):
    """create property -> materialize (projection) -> persist via the
    compaction-style rewrite -> the reread table carries the physical
    column with correct values; resolve_property serves the column."""
    from optiprism_spark.dsl import PropKind
    from optiprism_spark.ingest import materialize_properties
    from optiprism_spark.schema import load_table

    cat = Catalog()
    cat.create_property(1, {"name": "k", "dataType": "int64"})
    events = load_table(spark, SF_DIR, "events").limit(50)
    out = materialize_properties(events, cat, 1)
    dst = str(tmp_path / "events_rewritten")
    out.write.parquet(dst)

    reread = spark.read.parquet(dst)
    assert "e_i64_0" in reread.columns
    import json as _json

    for r in reread.select("props", "e_i64_0").collect():
        assert r.e_i64_0 == _json.loads(r.props).get("k")
    ref = cat.resolve_property(1, "k")
    assert ref.kind == PropKind.COLUMN and ref.name == "e_i64_0"
    # idempotent: a second pass sees nothing unmaterialized
    again = materialize_properties(reread, cat, 1)
    assert again.columns == reread.columns


def test_profile_routes(spark):
    """Reference profile plane (http/auth.rs:217-220): GET /profile
    from bearer claims; PUT name/email/password with old-password
    verification; email move keeps login working."""
    app = make_app(spark, SF_DIR, token_key="k")
    st, pair = call(app, "POST", "/api/v1/auth/signup",
                    {"email": "p@q.r", "password": "first-pass-123",
                     "firstName": "Ada"})
    assert st == 200

    def authed(method, path, body=None, token=None):
        raw = b"" if body is None else json.dumps(body).encode()
        environ = {
            "REQUEST_METHOD": method, "PATH_INFO": path, "QUERY_STRING": "",
            "CONTENT_LENGTH": str(len(raw)), "wsgi.input": io.BytesIO(raw),
            "HTTP_AUTHORIZATION": f"Bearer {token or pair['accessToken']}",
        }
        captured = {}
        chunks = b"".join(app(environ, lambda s, h: captured.update(
            status=int(s.split()[0]))))
        return captured["status"], json.loads(chunks) if chunks else None

    st, prof = authed("GET", "/api/v1/profile")
    assert st == 200 and prof["email"] == "p@q.r" and "passwordHash" not in prof
    st, prof = authed("PUT", "/api/v1/profile/name",
                      {"firstName": "Grace", "lastName": "H"})
    assert st == 200 and prof["firstName"] == "Grace"
    st, prof = authed("PUT", "/api/v1/profile/email", {"email": "new@q.r"})
    assert st == 200 and prof["email"] == "new@q.r"
    # wrong old password -> 401; right one rotates and relogin works
    st, _ = authed("PUT", "/api/v1/profile/password",
                   {"password": "wrong", "newPassword": "x"})
    assert st == 401
    st, _ = authed("PUT", "/api/v1/profile/password",
                   {"password": "first-pass-123", "newPassword": "second-pass-456"})
    assert st == 200
    st, _ = call(app, "POST", "/api/v1/auth/login",
                 {"email": "new@q.r", "password": "first-pass-123"})
    assert st == 401
    st, pair2 = call(app, "POST", "/api/v1/auth/login",
                     {"email": "new@q.r", "password": "second-pass-456"})
    assert st == 200 and "accessToken" in pair2


def test_attach_detach_property(app):
    st, ev = call(app, "POST", "/api/v1/projects/3/schema/events",
                  {"name": "checkout"})
    assert st == 201
    st, prop = call(app, "POST", "/api/v1/projects/3/schema/event-properties",
                    {"name": "cart_size", "dataType": "int64"})
    assert st == 201
    st, linked = call(
        app, "POST",
        f"/api/v1/projects/3/schema/events/{ev['id']}/properties/{prop['id']}")
    assert st == 200 and linked["propertyIds"] == [prop["id"]]
    # idempotent attach, missing property -> 404
    st, linked = call(
        app, "POST",
        f"/api/v1/projects/3/schema/events/{ev['id']}/properties/{prop['id']}")
    assert st == 200 and linked["propertyIds"] == [prop["id"]]
    st, _ = call(
        app, "POST",
        f"/api/v1/projects/3/schema/events/{ev['id']}/properties/999")
    assert st == 404
    st, unlinked = call(
        app, "DELETE",
        f"/api/v1/projects/3/schema/events/{ev['id']}/properties/{prop['id']}")
    assert st == 200 and unlinked["propertyIds"] == []


def test_admin_settings_singleton(app):
    st, s = call(app, "GET", "/api/v1/admin/settings")
    assert st == 200 and s["name"] == "settings"
    st, s2 = call(app, "PUT", "/api/v1/admin/settings",
                  {"backupEnabled": True, "backupProviderLocalPath": "/b"})
    assert st == 200 and s2["backupEnabled"] is True
    st, s3 = call(app, "GET", "/api/v1/admin/settings")
    assert st == 200 and s3["backupProviderLocalPath"] == "/b"
    assert s3["id"] == s["id"]  # singleton, not a new row


# ----------------------------------------------- persisted dictionaries

def test_dictionary_store_persists_keys(tmp_path):
    """Reference dictionaries.rs contract: a value's key never changes
    once assigned — across re-registration, new values, and process
    restarts; keys are 1-based and monotonic per (project, tbl, col)."""
    path = str(tmp_path / "md.db")
    cat = Catalog(path)
    m1 = cat.dict_register_values(1, "events", "event_type", ["view", "buy"])
    assert m1 == {"buy": 1, "view": 2}  # sorted assignment, 1-based
    # idempotent
    assert cat.dict_register_values(1, "events", "event_type",
                                    ["buy", "view"]) == m1
    # new values continue the sequence, old keys untouched
    m2 = cat.dict_register_values(1, "events", "event_type", ["add", "view"])
    assert m2 == {"buy": 1, "view": 2, "add": 3}
    # per-column namespaces are independent
    assert cat.dict_register_values(1, "events", "country", ["se"]) == {"se": 1}
    assert cat.dict_get_key(1, "events", "event_type", "add") == 3
    assert cat.dict_get_value(1, "events", "event_type", 1) == "buy"
    cat.close()

    cat2 = Catalog(path)
    assert cat2.dict_entries_for(1, "events", "event_type") == [
        (1, "buy"), (2, "view"), (3, "add")]
    m3 = cat2.dict_register_values(1, "events", "event_type", ["zzz"])
    assert m3["zzz"] == 4


def test_persisted_dictionary_encode_decode_roundtrip(spark, tmp_path):
    from optiprism_spark.operators.dictionary import (
        dict_decode, dict_encode, persisted_dictionary)

    cat = Catalog(str(tmp_path / "md.db"))
    df = spark.createDataFrame(
        [(1, "view"), (2, "buy"), (3, "view"), (4, None)], "id long, et string")
    dim = persisted_dictionary(cat, 1, "events", "et", df=df)
    enc = dict_encode(df, "et", dim)
    dec = dict_decode(enc, "et_key", dim, out_col="et")
    got = {r.id: r.et for r in dec.collect()}
    assert got == {1: "view", 2: "buy", 3: "view", 4: None}
    # a later run with MORE data keeps the original keys
    df2 = spark.createDataFrame([(5, "add"), (6, "buy")], "id long, et string")
    dim2 = persisted_dictionary(cat, 1, "events", "et", df=df2)
    keys1 = {r.value: r.key for r in dim.collect()}
    keys2 = {r.value: r.key for r in dim2.collect()}
    assert {v: k for v, k in keys2.items() if v in keys1} == keys1
    assert keys2["add"] == max(keys1.values()) + 1
    # mapping-only load (no df): same frame
    dim3 = persisted_dictionary(cat, 1, "events", "et", spark=spark)
    assert sorted(map(tuple, dim3.collect())) == sorted(map(tuple, dim2.collect()))
