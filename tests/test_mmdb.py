"""MaxMind-DB binary reader (mmdb.py): fixture build → read
round-trip at every record size, equivalence with the GeoLite2 CSV
loader on the same ranges, pointer/extended-type decoding, and
geoip_enrich running unchanged on an mmdb-loaded table."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from optiprism_spark.ingest import (
    geo_range_table,
    geo_range_table_from_csv,
    geoip_enrich,
)
from optiprism_spark.mmdb import (
    MMDBReader,
    _Decoder,
    build_mmdb,
    extract_country,
    geo_range_table_from_mmdb,
)

#: the synthetic /8-per-country ranges the geo oracle uses — one CIDR
#: per /8 block, so they compile to clean fixture networks
_COUNTRIES = ("US", "DE", "BR", "IN", "JP", "GB", "FR", "AU")


def _networks():
    return [
        (i << 24, 8, {"country": {"iso_code": _COUNTRIES[i % 8], "geoname_id": 100 + i}})
        for i in range(256)
    ]


@pytest.mark.parametrize("record_size", [24, 28, 32])
def test_roundtrip_every_record_size(tmp_path, record_size):
    path = str(tmp_path / f"fixture_{record_size}.mmdb")
    build_mmdb(path, _networks(), record_size=record_size)
    r = MMDBReader(path)
    assert r.metadata["record_size"] == record_size
    assert r.metadata["binary_format_major_version"] == 2
    got = sorted(
        (s, e, extract_country(rec)) for s, e, rec in r.ipv4_networks()
    )
    want = sorted(
        (net, net + (1 << 24) - 1, rec["country"]["iso_code"])
        for net, _, rec in _networks()
    )
    assert got == want


def test_lookup_matches_ranges(tmp_path):
    path = str(tmp_path / "f.mmdb")
    build_mmdb(path, _networks())
    r = MMDBReader(path)
    rng = random.Random(7)
    for _ in range(200):
        ip = rng.getrandbits(32)
        rec = r.lookup_ipv4(ip)
        assert extract_country(rec) == _COUNTRIES[(ip >> 24) % 8]


def test_sparse_tree_has_not_found_paths(tmp_path):
    """Records equal to node_count mean 'no data' — lookups outside
    any network must return None, not a neighboring record."""
    path = str(tmp_path / "sparse.mmdb")
    nets = [
        (10 << 24, 8, {"country": {"iso_code": "US"}}),
        ((192 << 24) | (168 << 16), 16, {"country": {"iso_code": "DE"}}),
    ]
    build_mmdb(path, nets)
    r = MMDBReader(path)
    assert extract_country(r.lookup_ipv4((10 << 24) + 12345)) == "US"
    assert extract_country(r.lookup_ipv4((192 << 24) | (168 << 16) | 7)) == "DE"
    assert r.lookup_ipv4(11 << 24) is None
    assert r.lookup_ipv4((192 << 24) | (169 << 16)) is None
    assert sorted(extract_country(x[2]) for x in r.ipv4_networks()) == ["DE", "US"]


def test_registered_country_fallback():
    assert extract_country({"registered_country": {"iso_code": "FR"}}) == "FR"
    assert extract_country({"country": {}, "registered_country": {"iso_code": "JP"}}) == "JP"
    assert extract_country({}) is None


def test_data_dedup_shares_offsets(tmp_path):
    """Identical records must be written once (MaxMind's own writers
    dedupe) — 256 networks over 8 countries stay a small file."""
    p8 = str(tmp_path / "dedup.mmdb")
    build_mmdb(p8, [(i << 24, 8, {"country": {"iso_code": _COUNTRIES[i % 8]}}) for i in range(256)])
    p1 = str(tmp_path / "single.mmdb")
    build_mmdb(p1, [(0, 8, {"country": {"iso_code": "US"}})])
    import os

    # 255 extra networks add tree nodes but only 7 extra data records
    assert os.path.getsize(p8) < os.path.getsize(p1) + 256 * 6 + 7 * 64


def test_pointer_decoding():
    """Hand-built buffer: a map whose value is a pointer (SS=0,
    11-bit) back into the data section — the layout real GeoLite2
    files use pervasively."""
    # data section: [0]: string "GB"; [3]: map {"c": <pointer to 0>}
    data = (
        bytes([(2 << 5) | 2]) + b"GB"
        + bytes([(7 << 5) | 1])
        + bytes([(2 << 5) | 1]) + b"c"
        + bytes([(1 << 5) | 0, 0])
    )
    d = _Decoder(data, base=0)
    value, _ = d.decode(3)
    assert value == {"c": "GB"}


def test_extended_types_decode():
    """uint64 (extended type 9) and arrays (extended type 11) as used
    by the metadata map."""
    buf = (
        bytes([(0 << 5) | 2, 9 - 7]) + (1 << 15).to_bytes(2, "big")
        + bytes([(0 << 5) | 2, 11 - 7])
        + bytes([(2 << 5) | 1]) + b"x"
        + bytes([(2 << 5) | 1]) + b"y"
    )
    d = _Decoder(buf)
    v1, off = d.decode(0)
    assert v1 == 1 << 15
    v2, _ = d.decode(off)
    assert v2 == ["x", "y"]


# --------------------------------------------------------- Spark integration


def _locations_csv(tmp_path):
    lines = ["geoname_id,locale_code,continent_code,continent_name,country_iso_code,country_name"]
    for i, c in enumerate(_COUNTRIES):
        lines.append(f"{1000 + i},en,NA,North America,{c},{c}land")
    p = tmp_path / "locations.csv"
    p.write_text("\n".join(lines))
    return str(p)


def _blocks_csv(tmp_path):
    lines = ["network,geoname_id,registered_country_geoname_id,is_anonymous_proxy"]
    for i in range(256):
        lines.append(f"{i}.0.0.0/8,{1000 + i % 8},,0")
    p = tmp_path / "blocks.csv"
    p.write_text("\n".join(lines))
    return str(p)


def test_mmdb_loader_equals_csv_loader(spark, tmp_path):
    """The binary and CSV loaders produce the identical range table on
    the same networks — geoip_enrich takes either without changes."""
    mmdb_path = str(tmp_path / "geo.mmdb")
    build_mmdb(mmdb_path, _networks())
    via_mmdb = sorted(
        map(tuple, geo_range_table_from_mmdb(spark, mmdb_path).collect())
    )
    via_csv = sorted(
        map(
            tuple,
            geo_range_table_from_csv(
                spark, _blocks_csv(tmp_path), _locations_csv(tmp_path)
            ).collect(),
        )
    )
    assert via_mmdb == via_csv
    assert len(via_mmdb) == 256


def test_geoip_enrich_from_mmdb(spark, tmp_path):
    """End-to-end: enrich rows against the mmdb-loaded table; results
    match the synthetic geo_range_table (same ranges by construction)."""
    mmdb_path = str(tmp_path / "geo.mmdb")
    build_mmdb(mmdb_path, _networks())
    rows = spark.createDataFrame(
        [(f"{i * 37 % 256}.{i % 256}.7.9",) for i in range(50)], "ip string"
    )
    got = sorted(
        map(tuple, geoip_enrich(rows, geo=geo_range_table_from_mmdb(spark, mmdb_path))
            .select("ip", "country").collect())
    )
    want = sorted(
        map(tuple, geoip_enrich(rows, geo=geo_range_table(spark))
            .select("ip", "country").collect())
    )
    assert got == want


def test_build_rejects_overlap_in_both_orders(tmp_path):
    """Review finding: inserting a broader network AFTER a narrower
    one silently replaced the subtree (dropping the narrow record)
    instead of raising; the guard now fires in both orders, and /0
    prefixes are rejected explicitly."""
    import pytest

    from optiprism_spark.mmdb import build_mmdb

    rec_a, rec_b = {"country": "AA"}, {"country": "BB"}
    p = str(tmp_path / "x.mmdb")
    with pytest.raises(ValueError, match="overlap"):
        build_mmdb(p, [(0x0A000000, 16, rec_a), (0x0A000000, 8, rec_b)])
    with pytest.raises(ValueError, match="overlap"):
        build_mmdb(p, [(0x0A000000, 8, rec_b), (0x0A000000, 16, rec_a)])
    with pytest.raises(ValueError, match="prefix length"):
        build_mmdb(p, [(0, 0, rec_a)])
