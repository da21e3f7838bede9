"""Persisted metadata catalog — the reference's RocksDB metadata store
re-expressed over stdlib sqlite3.

The reference keeps its admin-plane state (organizations, projects,
accounts, events, custom events, properties, dashboards, reports,
bookmarks) in RocksDB namespaces with per-namespace id sequences and
name indexes (reference metadata/src/lib.rs:28-29, properties.rs,
reports.rs, dashboards.rs). This module provides the same entity
model behind one sqlite file (or in-memory for tests): per-kind id
sequences, per-(kind, project) unique names, JSON bodies.

Why sqlite and not Spark tables: catalog traffic is the reference's
point-read/point-write admin loop (create property -> query it), not
an analytical scan; the reference makes exactly the same call by
putting it in RocksDB next to a parquet LSM. The query path consumes
the catalog only at plan-build time (property dtypes, custom-event
expansion) — never per row, never on executors — so catalog size and
placement are irrelevant to 100 TB query plans.

Properties follow the reference's protocol
(metadata/src/properties.rs:585-632):

- each created property is a *logical column*: ``Property::
  column_name()`` derives the physical name — system properties keep
  a snake_cased version of their name, user properties get
  ``e_{dtype_short}_{order}`` / ``g_{gid}_{dtype_short}_{order}``
  with a per-(type, dtype) order counter.
- the reference materializes that column into its dynamic-schema LSM
  (storage/src/db.rs:1233 ``add_field``, old parts null-filled on
  merge). A lake-backed Spark table evolves schema at write time
  instead (parquet/Delta schema merge); until a write materializes
  the column, user properties resolve into the events table's
  ``props`` JSON map with the catalog-declared dtype driving the
  cast. ``resolve_property`` hides the difference from the query
  layer, which is the point of the protocol.
"""

from __future__ import annotations

import datetime as dt
import json
import re
import sqlite3
import threading
from typing import Optional

from .dsl import PropertyRef
from .schema import DTYPE_TO_SPARK

#: entity kinds, mirroring the reference's metadata namespaces
KINDS = (
    "organization",
    "project",
    "account",
    "group",
    "event",
    "custom_event",
    "event_property",
    "group_property",
    "dashboard",
    "report",
    "bookmark",
    "setting",
    "rollup",
    "quality_check",
    "ann_index",
)

#: properties whose name matches a physical events column are system
#: properties (reference is_system, properties.rs:600) — they resolve
#: to the column itself, not into the props JSON map
SYSTEM_EVENT_COLUMNS = ("event_id", "ts", "user_id", "event_type", "value", "props")

#: reference DType::short_name() equivalents for column_name()
_DTYPE_SHORT = {
    "string": "str", "int8": "i8", "int16": "i16", "int32": "i32",
    "int64": "i64", "decimal": "dec", "boolean": "bool", "timestamp": "ts",
}


class CatalogError(Exception):
    pass


class NotFound(CatalogError):
    pass


class Conflict(CatalogError):
    pass


def _now() -> str:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None).isoformat(sep=" ")


def _snake(name: str) -> str:
    """Reference system-property name normalization
    (properties.rs:611-622): strip non [a-zA-Z0-9_ ], snake_case."""
    name = re.sub(r"[^a-zA-Z0-9_\s]", "", name)
    name = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", name)
    name = re.sub(r"[\s]+", "_", name.strip())
    return name.lower()


class Catalog:
    """sqlite-backed metadata catalog.

    ``path=None`` -> private in-memory database (tests); else a file
    path that persists across process restarts — the durability
    contract of the reference's RocksDB store.
    """

    def __init__(self, path: Optional[str] = None):
        self.path = path
        # Thread model: the connection is shared across WSGI threads
        # (check_same_thread=False) — safe because CPython's sqlite3
        # is built serialized (sqlite3.threadsafety == 3: the C lib
        # mutexes each call on the shared connection). The app lock
        # below additionally serializes multi-STATEMENT write
        # sequences (id allocation + insert + commit) so they stay
        # atomic with respect to each other; single-statement reads
        # need no app lock.
        self._lock = threading.Lock()
        self._db = sqlite3.connect(path or ":memory:", check_same_thread=False)
        self._db.execute("PRAGMA journal_mode=WAL") if path else None
        self._db.executescript(
            """
            CREATE TABLE IF NOT EXISTS entities (
              kind TEXT NOT NULL,
              id INTEGER NOT NULL,
              project_id INTEGER NOT NULL DEFAULT 0,
              name TEXT,
              body TEXT NOT NULL,
              created_at TEXT NOT NULL,
              updated_at TEXT,
              PRIMARY KEY (kind, project_id, id)
            );
            CREATE UNIQUE INDEX IF NOT EXISTS entities_name
              ON entities(kind, project_id, name) WHERE name IS NOT NULL;
            CREATE TABLE IF NOT EXISTS sequences (
              kind TEXT PRIMARY KEY, next_id INTEGER NOT NULL
            );
            CREATE TABLE IF NOT EXISTS dict_entries (
              project_id INTEGER NOT NULL,
              tbl TEXT NOT NULL,
              col TEXT NOT NULL,
              key INTEGER NOT NULL,
              value TEXT NOT NULL,
              PRIMARY KEY (project_id, tbl, col, key)
            );
            CREATE UNIQUE INDEX IF NOT EXISTS dict_entries_value
              ON dict_entries(project_id, tbl, col, value);
            """
        )
        self._db.commit()

    def close(self) -> None:
        self._db.close()

    # ------------------------------------------------------- generic CRUD

    def _next_id(self, kind: str) -> int:
        cur = self._db.execute(
            "INSERT INTO sequences(kind, next_id) VALUES (?, 2) "
            "ON CONFLICT(kind) DO UPDATE SET next_id = next_id + 1 "
            "RETURNING next_id - 1",
            (kind,),
        )
        return cur.fetchone()[0]

    def _next_order(self, key: str, floor: int) -> int:
        """Monotonic 0-based counter stored in the sequences table
        (keyed by a namespace string, not an entity kind). Returns at
        least ``floor`` so counters seeded on a pre-counter catalog
        never collide with orders already handed out."""
        with self._lock:
            cur = self._db.execute(
                "INSERT INTO sequences(kind, next_id) VALUES (?, ?) "
                "ON CONFLICT(kind) DO UPDATE SET next_id = MAX(next_id + 1, ?) "
                "RETURNING next_id",
                (key, floor + 1, floor + 1),
            )
            n = cur.fetchone()[0]
            self._db.commit()
        return n - 1

    def _check_kind(self, kind: str) -> None:
        if kind not in KINDS:
            raise CatalogError(f"unknown entity kind {kind!r}; known: {KINDS}")

    def create(self, kind: str, data: dict, project_id: int = 0) -> dict:
        self._check_kind(kind)
        name = data.get("name")
        with self._lock:
            eid = self._next_id(kind)
            row = dict(data, id=eid, projectId=project_id, createdAt=_now())
            try:
                self._db.execute(
                    "INSERT INTO entities(kind, id, project_id, name, body, created_at)"
                    " VALUES (?,?,?,?,?,?)",
                    (kind, eid, project_id, name, json.dumps(row), row["createdAt"]),
                )
                self._db.commit()
            except sqlite3.IntegrityError:
                self._db.rollback()
                raise Conflict(f"{kind} named {name!r} already exists in project {project_id}")
        return row

    def get(self, kind: str, eid: int, project_id: int = 0) -> dict:
        self._check_kind(kind)
        cur = self._db.execute(
            "SELECT body FROM entities WHERE kind=? AND project_id=? AND id=?",
            (kind, project_id, eid),
        )
        row = cur.fetchone()
        if row is None:
            raise NotFound(f"{kind} {eid} not found in project {project_id}")
        return json.loads(row[0])

    def get_by_name(self, kind: str, name: str, project_id: int = 0) -> dict:
        self._check_kind(kind)
        cur = self._db.execute(
            "SELECT body FROM entities WHERE kind=? AND project_id=? AND name=?",
            (kind, project_id, name),
        )
        row = cur.fetchone()
        if row is None:
            raise NotFound(f"{kind} named {name!r} not found in project {project_id}")
        return json.loads(row[0])

    def list(self, kind: str, project_id: int = 0) -> list[dict]:
        self._check_kind(kind)
        cur = self._db.execute(
            "SELECT body FROM entities WHERE kind=? AND project_id=? ORDER BY id",
            (kind, project_id),
        )
        return [json.loads(r[0]) for r in cur.fetchall()]

    def update(self, kind: str, eid: int, data: dict, project_id: int = 0) -> dict:
        row = self.get(kind, eid, project_id)  # raises NotFound
        protected = {"id", "projectId", "createdAt"}
        row.update({k: v for k, v in data.items() if k not in protected})
        row["updatedAt"] = _now()
        with self._lock:
            try:
                self._db.execute(
                    "UPDATE entities SET name=?, body=?, updated_at=? "
                    "WHERE kind=? AND project_id=? AND id=?",
                    (row.get("name"), json.dumps(row), row["updatedAt"],
                     kind, project_id, eid),
                )
                self._db.commit()
            except sqlite3.IntegrityError:
                self._db.rollback()
                raise Conflict(
                    f"{kind} named {row.get('name')!r} already exists in project {project_id}"
                )
        return row

    def delete(self, kind: str, eid: int, project_id: int = 0) -> dict:
        row = self.get(kind, eid, project_id)
        with self._lock:
            self._db.execute(
                "DELETE FROM entities WHERE kind=? AND project_id=? AND id=?",
                (kind, project_id, eid),
            )
            self._db.commit()
        return row

    # ------------------------------------------------ property protocol

    def create_property(
        self, project_id: int, data: dict, typ: str = "event", group_id: int = 0
    ) -> dict:
        """Create a property, assigning order and column_name by the
        reference protocol (properties.rs:585-632). ``data`` needs
        ``name`` and ``dataType`` (a DType name); everything else
        (description, displayName, tags, …) rides along."""
        name = data.get("name")
        if not name:
            raise CatalogError("property requires a name")
        dtype = data.get("dataType", "string")
        if dtype not in DTYPE_TO_SPARK:
            raise CatalogError(
                f"unknown dataType {dtype!r}; known: {sorted(DTYPE_TO_SPARK)}"
            )
        kind = "group_property" if typ == "group" else "event_property"
        is_system = typ == "event" and name in SYSTEM_EVENT_COLUMNS
        # Persistent monotonic order counter per (kind, dtype, group)
        # namespace, like the reference's next_zero_seq on
        # properties/order/{dtype} (properties.rs:240-263). Never derived
        # from the live property count: after a DELETE, len() would reuse
        # an existing columnName and materialize one property's values
        # into another's physical column. The floor seeds the counter at
        # max(existing order)+1 for catalogs created before the counter
        # existed.
        gid = group_id if typ == "group" else 0
        same = [
            p for p in self.list(kind, project_id)
            if p.get("dataType") == dtype and (p.get("groupId") or 0) == gid
        ]
        floor = max((p.get("order", -1) for p in same), default=-1) + 1
        order = self._next_order(f"order:{kind}:{project_id}:{dtype}:{gid}", floor)
        if is_system:
            column_name = _snake(name)
        elif typ == "group":
            column_name = f"g_{group_id}_{_DTYPE_SHORT[dtype]}_{order}"
        else:
            column_name = f"e_{_DTYPE_SHORT[dtype]}_{order}"
        row = dict(
            data,
            dataType=dtype,
            order=order,
            isSystem=is_system,
            columnName=column_name,
            groupId=group_id if typ == "group" else None,
        )
        return self.create(kind, row, project_id)

    def get_or_create_property(self, project_id: int, data: dict, **kw) -> dict:
        try:
            return self.get_by_name(
                "group_property" if kw.get("typ") == "group" else "event_property",
                data["name"], project_id,
            )
        except NotFound:
            return self.create_property(project_id, data, **kw)

    def resolve_property(self, project_id: int, name: str) -> PropertyRef:
        """Catalog-driven property resolution for the query layer:
        system properties -> the physical column; materialized user
        properties -> their ``column_name()`` physical column;
        unmaterialized ones -> the ``props`` JSON map with the
        declared dtype (see module docstring)."""
        prop = self.get_by_name("event_property", name, project_id)
        if prop["isSystem"] or prop.get("materialized"):
            return PropertyRef.column(prop["columnName"])
        return PropertyRef.json(name, prop["dataType"])

    def mark_materialized(self, project_id: int, name: str) -> dict:
        """Flip a property to materialized after its physical column
        has been written (ingest.materialize_properties) — the
        bookkeeping half of the reference's ``add_field`` dynamic
        schema (storage/src/db.rs:1233): from then on queries read the
        physical column, not the JSON map."""
        prop = self.get_by_name("event_property", name, project_id)
        return self.update("event_property", prop["id"],
                           {"materialized": True}, project_id)

    def properties_dtypes(self, project_id: int) -> dict[str, str]:
        """{property name -> declared dtype} for every non-system
        event property — the map api.py consumes so JSON-property
        casts come from the catalog instead of literal inference."""
        return {
            p["name"]: p["dataType"]
            for p in self.list("event_property", project_id)
            if not p.get("isSystem")
        }

    def validate_properties(self, df) -> list[str]:
        """Check every system property against the physical schema —
        the validation half of create-property->materialize. Returns
        a list of problems (empty = valid)."""
        spark_types = {f.name: f.dataType for f in df.schema.fields}
        problems = []
        for pid in self._project_ids():
            for p in self.list("event_property", pid):
                if not p["isSystem"]:
                    continue
                col = p["columnName"]
                if col not in spark_types:
                    problems.append(f"system property {p['name']!r}: column {col!r} missing")
        return problems

    def _project_ids(self) -> list[int]:
        cur = self._db.execute("SELECT DISTINCT project_id FROM entities")
        return [r[0] for r in cur.fetchall()]

    # ------------------------------------------------------ dictionaries

    def dict_register_values(
        self, project_id: int, tbl: str, col: str, values
    ) -> dict[str, int]:
        """Persisted per-(project, table, column) string→int map — the
        reference's dictionaries store (metadata/src/dictionaries.rs:
        40,121-145 get_key_or_create): existing values keep their keys
        FOREVER; unseen values get the next keys from a monotonic
        per-column sequence (1-based, like the reference). New values
        are assigned in sorted order so one sync from the same data is
        deterministic. Returns the full value→key map for the column.
        """
        values = {v for v in values if v is not None}
        with self._lock:
            cur = self._db.execute(
                "SELECT value, key FROM dict_entries "
                "WHERE project_id=? AND tbl=? AND col=?",
                (project_id, tbl, col),
            )
            mapping = {v: k for v, k in cur.fetchall()}
            fresh = sorted(v for v in values if v not in mapping)
            if fresh:
                seq_key = f"dict:{project_id}:{tbl}:{col}"
                cur = self._db.execute(
                    "INSERT INTO sequences(kind, next_id) VALUES (?, ?) "
                    "ON CONFLICT(kind) DO UPDATE SET next_id = next_id + ? "
                    "RETURNING next_id",
                    (seq_key, len(fresh) + 1, len(fresh)),
                )
                next_id = cur.fetchone()[0]  # first unassigned key AFTER this batch
                start = next_id - len(fresh)
                self._db.executemany(
                    "INSERT INTO dict_entries(project_id, tbl, col, key, value)"
                    " VALUES (?,?,?,?,?)",
                    [(project_id, tbl, col, start + i, v)
                     for i, v in enumerate(fresh)],
                )
                mapping.update({v: start + i for i, v in enumerate(fresh)})
            self._db.commit()
        return mapping

    def dict_get_key(self, project_id: int, tbl: str, col: str, value: str):
        cur = self._db.execute(
            "SELECT key FROM dict_entries "
            "WHERE project_id=? AND tbl=? AND col=? AND value=?",
            (project_id, tbl, col, value),
        )
        row = cur.fetchone()
        return row[0] if row else None

    def dict_get_value(self, project_id: int, tbl: str, col: str, key: int):
        cur = self._db.execute(
            "SELECT value FROM dict_entries "
            "WHERE project_id=? AND tbl=? AND col=? AND key=?",
            (project_id, tbl, col, key),
        )
        row = cur.fetchone()
        return row[0] if row else None

    def dict_entries_for(self, project_id: int, tbl: str, col: str) -> list[tuple[int, str]]:
        cur = self._db.execute(
            "SELECT key, value FROM dict_entries "
            "WHERE project_id=? AND tbl=? AND col=? ORDER BY key",
            (project_id, tbl, col),
        )
        return [(k, v) for k, v in cur.fetchall()]

    # ---------------------------------------------------- custom events

    def custom_events_map(self, project_id: int) -> dict:
        """{id and name -> member event dicts} in the format
        api.parse_event_ref expands (reference query/src/expr.rs:60-115
        resolves custom events from this same metadata store)."""
        out: dict = {}
        for ce in self.list("custom_event", project_id):
            members = ce.get("events") or []
            out[ce["id"]] = members
            if ce.get("name"):
                out[ce["name"]] = members
        return out
