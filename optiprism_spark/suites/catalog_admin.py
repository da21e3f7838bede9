"""Admin-plane queries: the metadata catalog driving the query plane.

The reference's core admin loop is create-metadata-then-query-it:
properties and custom events are created through CRUD routes
(platform/src/http/mod.rs:57-62) into the RocksDB catalog
(metadata/src/properties.rs, custom_events.rs) and consumed by query
compilation (query/src/event_segmentation.rs:103-107 resolves
properties via metadata; query/src/expr.rs:60-115 expands custom
events). Here the same loop runs through catalog.py + server.py: the
registered query below creates its metadata through real HTTP CRUD
requests, then queries on it — the catalog's declared dtype (not
literal inference) drives the JSON-property cast.
"""

from __future__ import annotations

import io
import json

from pyspark.sql import functions as F

from ..registry import query
from . import _sql as S


def _call(app, method, path, body):
    raw = json.dumps(body).encode()
    environ = {
        "REQUEST_METHOD": method, "PATH_INFO": path, "QUERY_STRING": "",
        "CONTENT_LENGTH": str(len(raw)), "wsgi.input": io.BytesIO(raw),
    }
    out = {}
    chunks = b"".join(app(environ, lambda s, h: out.update(s=int(s.split()[0]))))
    assert out["s"] < 300, (out, chunks)
    return json.loads(chunks) if chunks else None


@query(
    "catalog_property_query",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, COUNT(*) AS n
    FROM events WHERE {S.ts_between(*S.T_FULL)}
      AND (event_type = 'view'
           OR (event_type = 'click'
               AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50))
      AND CAST(json_extract_string(props, '$.k') AS BIGINT) < 90
    GROUP BY 1
    """,
)
def catalog_property_query(spark, sf_dir):
    """Create a property + custom event through HTTP CRUD, then run a
    segmentation that (a) expands the catalog-created custom event and
    (b) filters on the catalog-created int64 property whose dtype
    comes from the catalog — the body carries no dtype hints at all."""
    from ..server import make_app

    app = make_app(spark, sf_dir)
    prop = _call(app, "POST", "/api/v1/projects/1/schema/event-properties",
                 {"name": "k", "dataType": "int64"})
    assert prop["columnName"] == "e_i64_0"  # column_name protocol
    ce = _call(app, "POST", "/api/v1/projects/1/schema/custom-events",
               {"name": "engagement", "events": [
                   {"eventName": "view", "eventType": "regular"},
                   {"eventName": "click", "eventType": "regular",
                    "filters": [{"type": "property", "propertyType": "event",
                                 "propertyName": "k", "operation": "gte",
                                 "value": [50]}]},
               ]})
    body = {
        "time": {"type": "between", "from": "2024-01-01T00:00:00",
                 "to": "2024-01-31T23:59:59"},
        "group": "user", "intervalUnit": "day", "chartType": "line",
        "analysis": {"type": "linear"},
        "events": [{"eventType": "custom", "eventId": ce["id"],
                    "queries": [{"type": "countEvents"}]}],
        "filters": {"groups": [{"filters": [
            {"type": "property", "propertyType": "event",
             "propertyName": "k", "operation": "lt", "value": [90]}]}]},
    }
    # compile via the same catalog-consumption path the WSGI handler
    # uses (props dtype map + custom-event expansion)
    from .. import api
    from ..queries.event_segmentation import run_event_segmentation
    from ..schema import load_table

    req = api.parse_event_segmentation(
        body,
        custom_events=app.catalog.custom_events_map(1),
        props=app.catalog.properties_dtypes(1),
    )
    events = load_table(spark, sf_dir, "events")
    out = run_event_segmentation(events, req)
    return out.select(F.col("bucket"), F.col("0_0_count_events").alias("n"))


@query(
    "catalog_materialized_property",
    oracle=f"""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS k_mod,
           COUNT(*) AS n
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1
    """,
)
def catalog_materialized_property(spark, sf_dir):
    """The materialization half of the admin loop (reference dynamic
    schema, storage/src/db.rs:1233 add_field): create property ->
    materialize_properties writes the Property::column_name() physical
    column (pure projection, no shuffle) -> resolve_property now
    serves the COLUMN ref -> the query groups by the physical column.
    The oracle reads the same values straight from the JSON map, so a
    materialization bug (wrong cast, wrong column, stale resolution)
    breaks the hash."""
    from ..catalog import Catalog
    from ..dsl import PropKind
    from ..exprs import full_filter, prop_col
    from ..ingest import materialize_properties
    from ..schema import load_table
    from ..suites.segmentation import _FULL

    cat = Catalog()
    cat.create_property(1, {"name": "k", "dataType": "int64"})
    events = load_table(spark, sf_dir, "events")
    events = materialize_properties(events, cat, 1)
    assert "e_i64_0" in events.columns
    ref = cat.resolve_property(1, "k")
    assert ref.kind == PropKind.COLUMN and ref.name == "e_i64_0"
    return (
        events.filter(full_filter(time=_FULL))
        .groupBy((prop_col(ref) % 5).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
