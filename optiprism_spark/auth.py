"""Auth for the HTTP facade — JWT bearer tokens + salted password
hashes, stdlib only.

Mirrors the reference's auth plane (platform/src/auth/token.rs:
HS512 JWTs with camelCase claims {exp, accountId, organizationId};
password.rs: salted Argon2 hashes; http/auth.rs routes signup/login/
refresh-token). Substitutions, both public primitives: HMAC-SHA512
JWS via hmac/hashlib (no external jwt lib in this container) and
scrypt (hashlib.scrypt) in place of Argon2 — same shape (memory-hard
KDF, per-account random salt, constant-time verify).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import time

ACCESS_TOKEN_TTL_S = 60 * 60  # reference cfg default: 1h access
REFRESH_TOKEN_TTL_S = 30 * 24 * 60 * 60  # 30d refresh


class AuthError(Exception):
    pass


# ------------------------------------------------------------------ JWT

def _b64url(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def _unb64url(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def make_token(claims: dict, key: str) -> str:
    """HS512 JWS, same header the reference emits (token.rs:32-42)."""
    header = _b64url(json.dumps({"alg": "HS512", "typ": "JWT"}).encode())
    payload = _b64url(json.dumps(claims, separators=(",", ":")).encode())
    signing_input = f"{header}.{payload}".encode()
    sig = hmac.new(key.encode(), signing_input, hashlib.sha512).digest()
    return f"{header}.{payload}.{_b64url(sig)}"


def parse_token(token: str, key: str) -> dict:
    """Verify signature + expiry; raises AuthError like the
    reference's unauthorized() path (platform/src/auth)."""
    try:
        header_s, payload_s, sig_s = token.split(".")
    except ValueError:
        raise AuthError("malformed token")
    signing_input = f"{header_s}.{payload_s}".encode()
    expected = hmac.new(key.encode(), signing_input, hashlib.sha512).digest()
    if not hmac.compare_digest(expected, _unb64url(sig_s)):
        raise AuthError("bad token signature")
    claims = json.loads(_unb64url(payload_s))
    if claims.get("exp", 0) < time.time():
        raise AuthError("token expired")
    return claims


def make_access_token(account_id: int, organization_id: int, key: str,
                      ttl_s: int = ACCESS_TOKEN_TTL_S) -> str:
    return make_token(
        {"exp": int(time.time()) + ttl_s, "accountId": account_id,
         "organizationId": organization_id, "typ": "access"},
        key,
    )


def make_refresh_token(account_id: int, key: str,
                       ttl_s: int = REFRESH_TOKEN_TTL_S) -> str:
    """The ``typ`` claim makes access and refresh tokens structurally
    distinct, mirroring the reference's separate AccessClaims /
    RefreshClaims types (auth/token.rs:18-30) — without it a leaked
    1-hour access token could mint fresh token pairs forever."""
    return make_token(
        {"exp": int(time.time()) + ttl_s, "accountId": account_id,
         "typ": "refresh"},
        key,
    )


# ------------------------------------------------------------ passwords

def make_password_hash(password: str) -> str:
    salt = os.urandom(16)
    dk = hashlib.scrypt(password.encode(), salt=salt, n=2**14, r=8, p=1)
    return f"scrypt${salt.hex()}${dk.hex()}"


def verify_password(password: str, password_hash: str) -> bool:
    try:
        algo, salt_hex, dk_hex = password_hash.split("$")
        if algo != "scrypt":
            return False
        dk = hashlib.scrypt(
            password.encode(), salt=bytes.fromhex(salt_hex), n=2**14, r=8, p=1
        )
        return hmac.compare_digest(dk, bytes.fromhex(dk_hex))
    except (ValueError, TypeError):
        return False


# ------------------------------------------------------- account flows

def sign_up(catalog, body: dict, key: str) -> dict:
    """POST /api/v1/auth/signup (reference http/auth.rs:210). Creates
    the account in the catalog and returns a token pair.

    The FIRST account in an empty catalog bootstraps as root admin —
    the analogue of the reference's init step that seeds an admin
    account; every later signup starts with NO roles (reference
    provider.rs:75-77 creates role: None) and must be granted
    organization/project roles through the accounts CRUD."""
    email = body.get("email")
    password = body.get("password")
    if not email or not password:
        raise AuthError("signup requires email and password")
    from .catalog import Conflict

    bootstrap_admin = not catalog.list("account")
    try:
        acct = catalog.create(
            "account",
            {"name": email, "email": email,
             "passwordHash": make_password_hash(password),
             "organizationId": int(body.get("organizationId", 1)),
             "role": "admin" if bootstrap_admin else None,
             "firstName": body.get("firstName"), "lastName": body.get("lastName")},
        )
    except Conflict:
        raise AuthError(f"account {email!r} already exists")
    return _token_pair(acct, key)


def log_in(catalog, body: dict, key: str) -> dict:
    """POST /api/v1/auth/login (reference http/auth.rs:211)."""
    from .catalog import NotFound

    try:
        acct = catalog.get_by_name("account", body.get("email", ""))
    except NotFound:
        raise AuthError("invalid email or password")
    if not verify_password(body.get("password", ""), acct.get("passwordHash", "")):
        raise AuthError("invalid email or password")
    return _token_pair(acct, key)


#: the epoch when the ``typ`` claim shipped. A legacy (typ-less)
#: refresh token was necessarily minted before this, so its exp is at
#: most DEPLOY + REFRESH_TTL — the deadline below. This makes the
#: migration carve-out actually expire: after one TTL window from the
#: deploy, NO typ-less token verifies, closing the otherwise-permanent
#: hole where any signed typ-less claims could mint token pairs.
_TYP_CLAIM_DEPLOY_EPOCH = 1_786_700_000  # 2026-08-14, typ claim release
_LEGACY_TYP_DEADLINE = _TYP_CLAIM_DEPLOY_EPOCH + REFRESH_TOKEN_TTL_S


def refresh(catalog, body: dict, key: str) -> dict:
    """POST /api/v1/auth/refresh-token (reference http/auth.rs:212).
    Only a true refresh token is accepted: anything carrying
    organizationId (an access token) is rejected outright, and a
    ``typ`` claim, when present, must say ``refresh``. Legacy refresh
    tokens minted before the ``typ`` claim existed carry neither field
    and stay valid for their remaining TTL — but ONLY tokens whose exp
    proves pre-deploy minting (see ``_LEGACY_TYP_DEADLINE``), so the
    grace window genuinely closes after one TTL."""
    claims = parse_token(body.get("refreshToken", ""), key)
    typ = claims.get("typ")
    if "organizationId" in claims:
        raise AuthError("not a refresh token")
    if typ is None:
        if claims.get("exp", 0) > _LEGACY_TYP_DEADLINE:
            raise AuthError("not a refresh token")
    elif typ != "refresh":
        raise AuthError("not a refresh token")
    acct = catalog.get("account", int(claims["accountId"]))
    return _token_pair(acct, key)


def _token_pair(acct: dict, key: str) -> dict:
    return {
        "accessToken": make_access_token(
            acct["id"], acct.get("organizationId", 1), key
        ),
        "refreshToken": make_refresh_token(acct["id"], key),
    }
