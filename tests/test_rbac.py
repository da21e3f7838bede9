"""RBAC enforcement tests (reference common/src/rbac.rs +
platform/src/context.rs): role→permission tables, the three-level
fallthrough, and per-route 403 paths — viewer tokens cannot mutate
schema or reach the admin plane, member tokens can manage schema but
not delete it, the bootstrap admin passes everything.
"""

from __future__ import annotations

import io
import json

import pytest

from optiprism_spark import rbac
from optiprism_spark.server import make_app

from .test_server import SF_DIR, call


# ------------------------------------------------------------ unit: tables

def test_root_admin_passes_everything():
    ctx = rbac.Context(role="admin")
    ctx.check_permission(rbac.MANAGE_ACCOUNTS)
    ctx.check_organization_permission(5, rbac.ORG_MANAGE)
    ctx.check_project_permission(5, 9, rbac.DELETE_SCHEMA)


def test_org_admin_passes_project_checks_in_org():
    ctx = rbac.Context(organization_id=1, organizations=[(1, "admin")])
    # org owner/admin fall through every project check (context.rs:103-110)
    ctx.check_project_permission(1, 7, rbac.DELETE_SCHEMA)
    # but org admin only gets ManageProjects at the org level
    ctx.check_organization_permission(1, rbac.ORG_MANAGE_PROJECTS)
    with pytest.raises(rbac.Forbidden):
        ctx.check_organization_permission(1, rbac.ORG_MANAGE)
    # and nothing at root scope
    with pytest.raises(rbac.Forbidden):
        ctx.check_permission(rbac.MANAGE_ACCOUNTS)


def test_project_role_table_member_vs_reader():
    member = rbac.Context(organization_id=1, projects=[(1, "member")])
    reader = rbac.Context(organization_id=1, projects=[(1, "reader")])
    member.check_project_permission(1, 1, rbac.MANAGE_SCHEMA)
    member.check_project_permission(1, 1, rbac.MANAGE_REPORTS)
    # member holds ManageSchema but NOT DeleteSchema (rbac.rs:83-88)
    with pytest.raises(rbac.Forbidden):
        member.check_project_permission(1, 1, rbac.DELETE_SCHEMA)
    reader.check_project_permission(1, 1, rbac.VIEW_SCHEMA)
    reader.check_project_permission(1, 1, rbac.EXPLORE_REPORTS)
    for denied in (rbac.MANAGE_SCHEMA, rbac.MANAGE_REPORTS, rbac.DELETE_SCHEMA):
        with pytest.raises(rbac.Forbidden):
            reader.check_project_permission(1, 1, denied)
    # roles are per-project: member of project 1 has nothing on project 2
    with pytest.raises(rbac.Forbidden):
        member.check_project_permission(1, 2, rbac.VIEW_SCHEMA)


# ------------------------------------------------------------- e2e: routes

def _authed(app, token, method, path, body=None):
    raw = b"" if body is None else json.dumps(body).encode()
    environ = {
        "REQUEST_METHOD": method, "PATH_INFO": path, "QUERY_STRING": "",
        "CONTENT_LENGTH": str(len(raw)), "wsgi.input": io.BytesIO(raw),
        "HTTP_AUTHORIZATION": f"Bearer {token}",
    }
    captured = {}
    chunks = b"".join(app(environ, lambda s, h: captured.update(
        status=int(s.split()[0]))))
    return captured["status"], json.loads(chunks) if chunks else None


@pytest.fixture(scope="module")
def rbac_app(spark):
    """App with three principals: the bootstrap admin (first signup),
    a project-1 reader ('viewer'), and a project-1 member."""
    app = make_app(spark, SF_DIR, token_key="rbac-key")
    _, admin = call(app, "POST", "/api/v1/auth/signup",
                    {"email": "root@x.y", "password": "pw-root-123"})
    _, viewer = call(app, "POST", "/api/v1/auth/signup",
                     {"email": "viewer@x.y", "password": "pw-view-123"})
    _, member = call(app, "POST", "/api/v1/auth/signup",
                     {"email": "member@x.y", "password": "pw-memb-123"})
    # the admin grants per-project roles through accounts CRUD
    # (reference UpdateAccountRequest.projects)
    st, accounts = _authed(app, admin["accessToken"], "GET", "/api/v1/accounts")
    assert st == 200
    by_email = {a["email"]: a["id"] for a in accounts}
    st, _ = _authed(app, admin["accessToken"], "PUT",
                    f"/api/v1/accounts/{by_email['viewer@x.y']}",
                    {"projects": [[1, "reader"]]})
    assert st == 200
    st, _ = _authed(app, admin["accessToken"], "PUT",
                    f"/api/v1/accounts/{by_email['member@x.y']}",
                    {"projects": [[1, "member"]]})
    assert st == 200
    return app, admin["accessToken"], viewer["accessToken"], member["accessToken"]


def test_bootstrap_admin_only_first_account(rbac_app):
    app, admin, viewer, _ = rbac_app
    st, accounts = _authed(app, admin, "GET", "/api/v1/accounts")
    roles = {a["email"]: a.get("role") for a in accounts}
    assert roles["root@x.y"] == "admin"
    assert roles["viewer@x.y"] is None


def test_viewer_403_on_schema_mutations(rbac_app):
    app, admin, viewer, _ = rbac_app
    st, ev = _authed(app, admin, "POST", "/api/v1/projects/1/schema/events",
                     {"name": "rbac_e1"})
    assert st == 201
    # viewer: reads pass (ViewSchema), writes 403
    st, _ = _authed(app, viewer, "GET", "/api/v1/projects/1/schema/events")
    assert st == 200
    for method, path, body in [
        ("POST", "/api/v1/projects/1/schema/events", {"name": "nope"}),
        ("PUT", f"/api/v1/projects/1/schema/events/{ev['id']}", {"name": "nope"}),
        ("DELETE", f"/api/v1/projects/1/schema/events/{ev['id']}", None),
        ("POST", "/api/v1/projects/1/schema/event-properties",
         {"name": "p", "dataType": "string"}),
        ("POST", "/api/v1/projects/1/schema/custom-events",
         {"name": "ce", "events": []}),
        ("POST", "/api/v1/projects/1/groups", {"name": "g"}),
        ("POST", "/api/v1/projects/1/reports", {"name": "r"}),
        ("POST", "/api/v1/projects/1/dashboards", {"name": "d"}),
    ]:
        st, _ = _authed(app, viewer, method, path, body)
        assert st == 403, (method, path, st)


def test_viewer_can_explore_reports(rbac_app):
    app, _, viewer, _ = rbac_app
    st, _ = _authed(app, viewer, "POST", "/api/v1/projects/1/property-values",
                    {"propertyName": "event_type"})
    assert st == 200
    # but not on a project they hold no role in
    st, _ = _authed(app, viewer, "POST", "/api/v1/projects/2/property-values",
                    {"propertyName": "event_type"})
    assert st == 403


def test_member_manages_but_cannot_delete_schema(rbac_app):
    app, admin, _, member = rbac_app
    st, ev = _authed(app, member, "POST", "/api/v1/projects/1/schema/events",
                     {"name": "rbac_member_e"})
    assert st == 201
    st, _ = _authed(app, member, "PUT",
                    f"/api/v1/projects/1/schema/events/{ev['id']}",
                    {"description": "ok"})
    assert st == 200
    # DeleteSchema is owner-only among project roles (rbac.rs:83-88)
    st, _ = _authed(app, member, "DELETE",
                    f"/api/v1/projects/1/schema/events/{ev['id']}")
    assert st == 403
    st, _ = _authed(app, admin, "DELETE",
                    f"/api/v1/projects/1/schema/events/{ev['id']}")
    assert st == 200


def test_admin_plane_is_root_only(rbac_app):
    app, admin, viewer, member = rbac_app
    for tok in (viewer, member):
        st, _ = _authed(app, tok, "GET", "/api/v1/accounts")
        assert st == 403
        st, _ = _authed(app, tok, "GET", "/api/v1/admin/settings")
        assert st == 403
        st, _ = _authed(app, tok, "POST", "/api/v1/admin/backups", {})
        assert st == 403
        st, _ = _authed(app, tok, "POST", "/api/v1/organizations", {"name": "o"})
        assert st == 403
    st, _ = _authed(app, admin, "GET", "/api/v1/admin/settings")
    assert st == 200


def test_profile_needs_no_extra_role(rbac_app):
    app, _, viewer, _ = rbac_app
    st, prof = _authed(app, viewer, "GET", "/api/v1/profile")
    assert st == 200 and prof["email"] == "viewer@x.y"


def test_grant_revoke_applies_to_live_tokens(rbac_app):
    """Roles are read from the account row per request, so a revoke
    takes effect without waiting for token expiry."""
    app, admin, _, _ = rbac_app
    _, pair = call(app, "POST", "/api/v1/auth/signup",
                   {"email": "temp@x.y", "password": "pw-temp-123"})
    st, _ = _authed(app, pair["accessToken"], "POST",
                    "/api/v1/projects/1/schema/events", {"name": "tmp_e"})
    assert st == 403
    st, accounts = _authed(app, admin, "GET", "/api/v1/accounts")
    aid = next(a["id"] for a in accounts if a["email"] == "temp@x.y")
    _authed(app, admin, "PUT", f"/api/v1/accounts/{aid}",
            {"projects": [[1, "owner"]]})
    st, ev = _authed(app, pair["accessToken"], "POST",
                     "/api/v1/projects/1/schema/events", {"name": "tmp_e"})
    assert st == 201
    _authed(app, admin, "PUT", f"/api/v1/accounts/{aid}", {"projects": []})
    st, _ = _authed(app, pair["accessToken"], "DELETE",
                    f"/api/v1/projects/1/schema/events/{ev['id']}")
    assert st == 403


def test_org_and_project_lists_are_filtered(rbac_app):
    """Collection listings narrow to what the principal may view
    (reference organizations.rs:46-53, projects.rs:137-153) instead of
    403ing: the admin sees everything, a project owner sees exactly
    their project, a role-less account sees nothing."""
    app, admin, viewer, _ = rbac_app
    st, p1 = _authed(app, admin, "POST", "/api/v1/projects", {"name": "proj-a"})
    assert st == 201
    st, p2 = _authed(app, admin, "POST", "/api/v1/projects", {"name": "proj-b"})
    assert st == 201
    st, o1 = _authed(app, admin, "POST", "/api/v1/organizations", {"name": "org-a"})
    assert st == 201

    st, all_projects = _authed(app, admin, "GET", "/api/v1/projects")
    assert st == 200 and {p["name"] for p in all_projects} >= {"proj-a", "proj-b"}
    st, all_orgs = _authed(app, admin, "GET", "/api/v1/organizations")
    assert st == 200 and any(o["name"] == "org-a" for o in all_orgs)

    # grant the viewer owner on proj-b only (proj-a's CRUD id collides
    # with the fixture's project-1 reader grant — first match wins)
    st, accounts = _authed(app, admin, "GET", "/api/v1/accounts")
    vid = next(a["id"] for a in accounts if a["email"] == "viewer@x.y")
    _authed(app, admin, "PUT", f"/api/v1/accounts/{vid}",
            {"projects": [[1, "reader"], [p2["id"], "owner"]]})
    st, vis = _authed(app, viewer, "GET", "/api/v1/projects")
    assert st == 200 and [p["name"] for p in vis] == ["proj-b"]
    st, vis_orgs = _authed(app, viewer, "GET", "/api/v1/organizations")
    assert st == 200 and vis_orgs == []
    # restore the fixture's grant for test-order independence
    _authed(app, admin, "PUT", f"/api/v1/accounts/{vid}",
            {"projects": [[1, "reader"]]})



def test_foreign_org_admin_cannot_touch_other_orgs_project(spark):
    """DELIBERATE DIVERGENCE from the reference (which passes the
    CALLER's org into check_project_permission, bookmarks.rs:29): an
    owner/admin of org B must NOT pass project checks for a project
    owned by org A — the check runs against the project's OWNING org."""
    app = make_app(spark, SF_DIR, token_key="xorg-key")
    _, root = call(app, "POST", "/api/v1/auth/signup",
                   {"email": "root@a.b", "password": "pw-root-123"})
    # org 1 project, created by the bootstrap admin
    st, proj = _authed(app, root["accessToken"], "POST", "/api/v1/projects",
                       {"name": "org1-proj", "organizationId": 1})
    assert st == 201
    # an admin of a DIFFERENT org (2)
    _, outsider = call(app, "POST", "/api/v1/auth/signup",
                       {"email": "out@x.y", "password": "pw-out-1234",
                        "organizationId": 2})
    st, accounts = _authed(app, root["accessToken"], "GET", "/api/v1/accounts")
    oid = {a["email"]: a["id"] for a in accounts}["out@x.y"]
    st, _ = _authed(app, root["accessToken"], "PUT", f"/api/v1/accounts/{oid}",
                    {"organizations": [[2, "admin"]]})
    assert st == 200
    # fresh token so the orgs claim is irrelevant (roles read live)
    _, out2 = call(app, "POST", "/api/v1/auth/login",
                   {"email": "out@x.y", "password": "pw-out-1234"})
    pid = proj["id"]
    st, _ = _authed(app, out2["accessToken"], "DELETE",
                    f"/api/v1/projects/{pid}")
    assert st == 403, "org-2 admin deleted an org-1 project"
    st, _ = _authed(app, out2["accessToken"], "PUT",
                    f"/api/v1/projects/{pid}", {"name": "stolen"})
    assert st == 403
    # and the org-1 project is invisible in their listing
    st, rows = _authed(app, out2["accessToken"], "GET", "/api/v1/projects")
    assert st == 200 and all(r["id"] != pid for r in rows)
