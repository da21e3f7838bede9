"""Role-based access control — the reference's rbac plane re-expressed.

Mirrors common/src/rbac.rs: a root ``Role`` (admin → all), per-
organization roles (owner/admin/member) and per-project roles
(owner/admin/member/reader), each mapped to a permission set, plus
the three-level fallthrough of platform/src/context.rs
(check_permission → check_organization_permission →
check_project_permission): a root admin passes everything, an
organization owner/admin passes every project check in their org,
otherwise the project role's permission table decides.

Accounts carry their grants in the catalog body (reference
metadata Account.role/organizations/projects):

    {"role": "admin"}                       # root role
    {"organizations": [[1, "owner"]]}       # per-org roles
    {"projects": [[1, "reader"], [2, "member"]]}

Scale note: RBAC is control-plane only — checks run once per HTTP
request against the in-process account row; nothing reaches Spark
plans or executors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


class Forbidden(Exception):
    """Maps to HTTP 403 (reference PlatformError::Forbidden)."""


# ---- root permissions (rbac.rs Permission / PERMISSIONS) ----
ALL = "all"
MANAGE_ACCOUNTS = "manage_accounts"
VIEW_ACCOUNTS = "view_accounts"
MANAGE_ORGANIZATIONS = "manage_organizations"
VIEW_ORGANIZATIONS = "view_organizations"
MANAGE_PROJECTS_ROOT = "manage_projects"
MANAGE_SERVER = "manage_server"

PERMISSIONS: dict[str, set[str]] = {
    "admin": {ALL},
}

# ---- organization permissions (rbac.rs OrganizationPermission) ----
ORG_VIEW = "view_organization"
ORG_MANAGE = "manage_organization"
ORG_MANAGE_PROJECTS = "manage_projects"
ORG_EXPLORE_PROJECTS = "explore_projects"
ORG_DELETE = "delete_organization"

ORGANIZATION_PERMISSIONS: dict[str, set[str]] = {
    "owner": {ALL},
    # REFERENCE PARITY QUIRK (rbac.rs:66-68): org admin holds ONLY
    # ManageProjects — no ViewOrganization — so an org admin can
    # create/delete every project in the org (the project-check
    # fallthrough grants all project actions) yet 403s on viewing the
    # org itself. Kept as-is for parity; grant ORG_VIEW here if the
    # asymmetry matters to your deployment.
    "admin": {ORG_MANAGE_PROJECTS},
    "member": set(),
}

# ---- project permissions (rbac.rs ProjectPermission) ----
MANAGE_PROJECT = "manage_project"
DELETE_PROJECT = "delete_project"
VIEW_PROJECT = "view_project"
MANAGE_SCHEMA = "manage_schema"
DELETE_SCHEMA = "delete_schema"
VIEW_SCHEMA = "view_schema"
INVITE_MEMBERS = "invite_members"
MANAGE_MEMBERS = "manage_members"
EXPLORE_REPORTS = "explore_reports"
MANAGE_REPORTS = "manage_reports"

PROJECT_PERMISSIONS: dict[str, set[str]] = {
    "owner": {ALL},
    "admin": {
        MANAGE_PROJECT, INVITE_MEMBERS, MANAGE_MEMBERS,
        EXPLORE_REPORTS, MANAGE_REPORTS, VIEW_SCHEMA, MANAGE_SCHEMA,
    },
    "member": {EXPLORE_REPORTS, MANAGE_REPORTS, VIEW_SCHEMA, MANAGE_SCHEMA},
    "reader": {EXPLORE_REPORTS, VIEW_SCHEMA},
}


@dataclass
class Context:
    """Per-request principal (reference platform/src/context.rs)."""

    account_id: int = 0
    organization_id: int = 0
    role: Optional[str] = None
    organizations: list = field(default_factory=list)  # [(org_id, role)]
    projects: list = field(default_factory=list)       # (project_id, role)

    @classmethod
    def from_account(cls, acct: dict) -> "Context":
        return cls(
            account_id=int(acct.get("id", 0)),
            organization_id=int(acct.get("organizationId") or 0),
            role=acct.get("role"),
            organizations=[tuple(x) for x in (acct.get("organizations") or [])],
            projects=[tuple(x) for x in (acct.get("projects") or [])],
        )

    # -------------------------------------------------- role lookups

    def _organization_role(self, org_id: int) -> Optional[str]:
        for oid, role in self.organizations:
            if int(oid) == int(org_id):
                return role
        return None

    def _project_role(self, project_id: int) -> Optional[str]:
        for pid, role in self.projects:
            if int(pid) == int(project_id):
                return role
        return None

    # ------------------------------------------------ checks (raise)

    def check_permission(self, permission: str) -> None:
        """Root role check (context.rs:39-66)."""
        granted = PERMISSIONS.get(self.role or "", set())
        if ALL in granted or permission in granted:
            return
        raise Forbidden("forbidden")

    def check_organization_permission(self, org_id: int, permission: str) -> None:
        """Org check with root fallthrough (context.rs:68-94)."""
        try:
            return self.check_permission(MANAGE_ORGANIZATIONS)
        except Forbidden:
            pass
        role = self._organization_role(org_id)
        granted = ORGANIZATION_PERMISSIONS.get(role or "", set())
        if ALL in granted or permission in granted:
            return
        raise Forbidden("forbidden")

    def check_project_permission(
        self, org_id: int, project_id: int, permission: str
    ) -> None:
        """Project check with root and org-role fallthrough
        (context.rs:96-128: org owner/admin pass everything)."""
        try:
            return self.check_permission(MANAGE_PROJECTS_ROOT)
        except Forbidden:
            pass
        if self._organization_role(org_id) in ("owner", "admin"):
            return
        role = self._project_role(project_id)
        granted = PROJECT_PERMISSIONS.get(role or "", set())
        if ALL in granted or permission in granted:
            return
        raise Forbidden("forbidden")
