"""HTTP facade — reference-shaped REST endpoints as a pure-WSGI app.

Routes mirror the reference router (platform/src/http/mod.rs:45-113 for
queries, ingester/src/sources/http/mod.rs:240-256 for ingest):

    POST /api/v1/projects/{pid}/queries/event-segmentation
    POST /api/v1/projects/{pid}/queries/funnel
    POST /api/v1/projects/{pid}/event-records/search
    GET  /api/v1/projects/{pid}/event-records/{id}
    POST /api/v1/projects/{pid}/group-records/search
    GET  /api/v1/projects/{pid}/group-records/{group}/{id}
    POST /api/v1/projects/{pid}/property-values
    POST /api/v1/ingest/{token}/track
    POST /api/v1/ingest/{token}/identify

Request bodies are the reference's camelCase JSON DSL, parsed by
`api.py`; responses are the reference's columnar JSON shape
(platform/src/lib.rs:592-640): ``{"columns": [{"name", "dataType",
"data": [...]}]}``, or the compact ``[[...column data...]]`` form with
``?format=jsonCompact``.

Scale note: the query endpoints `.collect()` ONLY final result frames,
which the operators already cap (chart series limits, RECORDS_LIMIT,
VALUES_LIMIT) — the driver-side materialization is bounded regardless
of input scale. Ingest buffers rows in process memory exactly like the
reference ingester's memtable and exposes the buffered batch as a
DataFrame through the same UA/GeoIP enrichment used for bulk ingest;
a production deployment fronts many stateless receivers that append to
object storage / a log, consumed by the Structured Streaming pipeline
(streaming/), so the facade process never becomes the write path's
bottleneck.

The app is framework-free WSGI: serve it with stdlib ``wsgiref`` (see
``serve``) or any production WSGI server unchanged.
"""

from __future__ import annotations

import datetime as dt
import json
import re
from decimal import Decimal
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from . import api
from .operators.funnel import funnel_report
from .operators.records import (
    event_record_by_id,
    event_records_search,
    group_record_by_id,
    group_records_search,
    property_values,
)
from .queries.event_segmentation import run_event_segmentation
from .schema import load_table


class HttpError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


_STATUS = {
    200: "200 OK", 201: "201 Created", 204: "204 No Content",
    400: "400 Bad Request", 404: "404 Not Found",
    405: "405 Method Not Allowed", 500: "500 Internal Server Error",
}


def _json_value(v):
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, (dt.date, dt.time)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return [_json_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_value(x) for k, x in v.items()}
    return v


def frame_to_response(df: DataFrame, compact: bool = False) -> dict | list:
    """DataFrame → reference columnar response (lib.rs:592-640).

    Collecting here is safe by construction: every frame routed through
    the facade is a capped final result (see module docstring)."""
    rows = df.collect()
    cols = [
        {
            "name": f.name,
            "dataType": f.dataType.simpleString(),
            "data": [_json_value(r[f.name]) for r in rows],
        }
        for f in df.schema.fields
    ]
    if compact:
        return [c["data"] for c in cols]
    return {"columns": cols}


# ------------------------------------------------------------------ ingest

def parse_track(body: dict, token: str = "") -> dict:
    """Reference TrackRequest (ingester/src/sources/http/mod.rs:93-102)
    → one flat event row. Context fields (UA string, IP, page, UTM)
    ride along raw; enrichment (UA parse, GeoIP range join) happens
    Spark-side in ``App.tracked_df`` — per-batch, not per-request."""
    if "event" not in body:
        raise HttpError(400, "track body requires 'event'")
    ctx = body.get("context") or {}
    page = ctx.get("page") or {}
    camp = ctx.get("campaign") or {}
    return {
        "token": token,
        "user_id": body.get("userId"),
        "anonymous_id": body.get("anonymousId"),
        "ts": body.get("timestamp"),
        "event_type": body["event"],
        "props": json.dumps(body.get("properties") or {}, sort_keys=True),
        "groups": json.dumps(body.get("groups") or {}, sort_keys=True),
        "user_agent": ctx.get("userAgent"),
        "ip": ctx.get("ip"),
        "page_path": page.get("path"),
        "page_url": page.get("url"),
        "utm_source": camp.get("source"),
    }


def parse_identify(body: dict, token: str = "") -> dict:
    """Reference IdentifyRequest (http/mod.rs:84-91) → profile row."""
    for k in ("group", "id"):
        if k not in body:
            raise HttpError(400, f"identify body requires {k!r}")
    return {
        "token": token,
        "group": body["group"],
        "id": body["id"],
        "ts": body.get("timestamp"),
        "props": json.dumps(body.get("properties") or {}, sort_keys=True),
    }


_TRACK_SCHEMA = (
    "token string, user_id string, anonymous_id string, ts string, "
    "event_type string, props string, groups string, user_agent string, "
    "ip string, page_path string, page_url string, utm_source string"
)
_IDENTIFY_SCHEMA = "token string, `group` string, id string, ts string, props string"


class App:
    """WSGI application bound to a SparkSession + one sf_dir dataset.

    ``custom_events``: {id_or_name: [member event dicts]} — the
    metadata catalog the reference resolves custom events against.
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        custom_events: Optional[dict] = None,
        now: Optional[dt.datetime] = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.custom_events = custom_events
        self.now = now  # fixed clock for "last N" windows in tests
        self.tracked: list[dict] = []
        self.identified: list[dict] = []
        self._routes: list[tuple[str, re.Pattern, Callable]] = [
            ("POST", re.compile(r"^/api/v1/projects/[^/]+/queries/event-segmentation$"),
             self._event_segmentation),
            ("POST", re.compile(r"^/api/v1/projects/[^/]+/queries/funnel$"),
             self._funnel),
            ("POST", re.compile(r"^/api/v1/projects/[^/]+/event-records/search$"),
             self._event_records_search),
            ("GET", re.compile(r"^/api/v1/projects/[^/]+/event-records/(?P<id>\d+)$"),
             self._event_record_by_id),
            ("POST", re.compile(r"^/api/v1/projects/[^/]+/group-records/search$"),
             self._group_records_search),
            ("GET", re.compile(
                r"^/api/v1/projects/[^/]+/group-records/(?P<group>[^/]+)/(?P<id>\d+)$"),
             self._group_record_by_id),
            ("POST", re.compile(r"^/api/v1/projects/[^/]+/property-values$"),
             self._property_values),
            ("POST", re.compile(r"^/api/v1/ingest/(?P<token>[^/]+)/track$"),
             self._track),
            ("POST", re.compile(r"^/api/v1/ingest/(?P<token>[^/]+)/identify$"),
             self._identify),
        ]

    # -------------------------------------------------------- handlers

    def _events(self) -> DataFrame:
        return load_table(self.spark, self.sf_dir, "events")

    def _event_segmentation(self, body, m, q):
        req = api.parse_event_segmentation(
            body, now=self.now, custom_events=self.custom_events
        )
        return 200, run_event_segmentation(self._events(), req)

    def _funnel(self, body, m, q):
        req = api.parse_funnel(body, now=self.now, custom_events=self.custom_events)
        return 200, funnel_report(self._events(), req)

    def _event_records_search(self, body, m, q):
        specs = tuple(
            api.EventFilterSpec(
                api.parse_event_ref(e, custom_events=self.custom_events),
                tuple(api.parse_filter(f) for f in e.get("filters") or ()),
            )
            for e in body.get("events") or ()
        )
        time = api.parse_time(body["time"], self.now) if body.get("time") else None
        filters = api._grouped_filters(body, api.EVENT_COLUMNS)
        return 200, event_records_search(
            self._events(), time=time, event_specs=specs, filters=filters
        )

    def _event_record_by_id(self, body, m, q):
        return 200, event_record_by_id(self._events(), int(m["id"]))

    def _group_records_search(self, body, m, q):
        sort = body.get("sort") or {}
        prop = sort.get("propertyName", api.GROUP_COLS[body.get("group", 0)])
        ascending = sort.get("direction", "asc") != "desc"
        return 200, group_records_search(
            self._events(), sort_prop=prop, ascending=ascending
        )

    def _group_record_by_id(self, body, m, q):
        group = m["group"]
        key = int(group) if group.isdigit() else group
        if key not in api.GROUP_COLS:
            raise HttpError(404, f"unknown group {group!r}")
        return 200, group_record_by_id(
            self._events(), int(m["id"]), user_col=api.GROUP_COLS[key]
        )

    def _property_values(self, body, m, q):
        prop = api.parse_property(body)
        return 200, property_values(
            self._events(), prop, filter_like=body.get("like")
        )

    def _track(self, body, m, q):
        self.tracked.append(parse_track(body, m["token"]))
        return 201, None

    def _identify(self, body, m, q):
        self.identified.append(parse_identify(body, m["token"]))
        return 201, None

    # ------------------------------------------------- ingest draining

    def tracked_df(self, enrich: bool = True) -> DataFrame:
        """Buffered /track rows as a DataFrame, through the same
        enrichment transformers as bulk ingest (UA regex catalog over
        distinct UAs, GeoIP broadcast range join) — the Spark half of
        the reference ingester pipeline (sources → transformers →
        destination)."""
        from .ingest import geoip_enrich, ua_enrich

        df = self.spark.createDataFrame(self.tracked or [], _TRACK_SCHEMA)
        if enrich:
            df = ua_enrich(df)
            df = geoip_enrich(df)
        return df

    def identified_df(self) -> DataFrame:
        return self.spark.createDataFrame(self.identified or [], _IDENTIFY_SCHEMA)

    # ----------------------------------------------------------- WSGI

    def __call__(self, environ, start_response):
        try:
            status, payload = self._dispatch(environ)
        except HttpError as e:
            status, payload = e.status, {"error": e.message}
        except (KeyError, ValueError, TypeError) as e:
            # parser-level contract violations → client error, like the
            # reference's serde rejection path
            status, payload = 400, {"error": f"{type(e).__name__}: {e}"}
        body = b"" if payload is None else json.dumps(payload).encode()
        headers = [("Content-Type", "application/json"),
                   ("Content-Length", str(len(body)))]
        start_response(_STATUS.get(status, _STATUS[500]), headers)
        return [body]

    def _dispatch(self, environ):
        method = environ["REQUEST_METHOD"]
        path = environ.get("PATH_INFO", "")
        query = environ.get("QUERY_STRING", "")
        matched_path = False
        for route_method, pat, handler in self._routes:
            m = pat.match(path)
            if not m:
                continue
            matched_path = True
            if method != route_method:
                continue
            body = {}
            if method == "POST":
                try:
                    n = int(environ.get("CONTENT_LENGTH") or 0)
                except ValueError:
                    n = 0
                raw = environ["wsgi.input"].read(n) if n else b""
                if raw:
                    try:
                        body = json.loads(raw)
                    except json.JSONDecodeError as e:
                        raise HttpError(400, f"invalid JSON body: {e}")
            status, result = handler(body, m.groupdict(), query)
            if result is None:
                return status, None
            compact = "format=jsonCompact" in query
            return status, frame_to_response(result, compact=compact)
        if matched_path:
            raise HttpError(405, f"method {method} not allowed for {path}")
        raise HttpError(404, f"no route for {path}")


def make_app(
    spark: SparkSession,
    sf_dir: str,
    custom_events: Optional[dict] = None,
    now: Optional[dt.datetime] = None,
) -> App:
    return App(spark, sf_dir, custom_events=custom_events, now=now)


def serve(app: App, host: str = "127.0.0.1", port: int = 8080) -> None:
    """Blocking dev server (stdlib wsgiref). Production: any WSGI
    server — the app object is framework-free."""
    from wsgiref.simple_server import make_server

    with make_server(host, port, app) as srv:
        srv.serve_forever()
