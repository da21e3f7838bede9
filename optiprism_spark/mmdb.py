"""MaxMind-DB (.mmdb) binary reader — the GeoIP production format.

The reference reads GeoLite2 through the maxminddb crate
(ingester/src/transformers/geo/mod.rs:1-54); operators who download
the standard binary ``.mmdb`` artifact should not have to convert it
to CSV first. This module parses the open MaxMind-DB format (spec:
maxmind.github.io/MaxMind-DB — binary search tree of record_size-bit
node pairs, a data section of typed fields, and a metadata map after
the ``\\xAB\\xCD\\xEFMaxMind.com`` marker) in pure Python on the
driver, and surfaces the database as the SAME (start_ip, end_ip,
country) range table the CSV loader produces — so
``geoip_enrich(geo=geo_range_table_from_mmdb(...))`` is a drop-in
swap and the bucketed broadcast range-join mechanics are untouched.

Scale note: a country-level mmdb is a few MB and parses once on the
driver (~600k networks); the result broadcasts exactly like the CSV
path. No per-row Python is involved in lookups — the tree walk here
exists only to ENUMERATE the database into a relational table at load
time, which is the Spark-native shape for a 100 TB fact-side join.

``build_mmdb`` writes the same format (record sizes 24/28/32,
deduplicated data records) — used by tests to round-trip fixtures and
usable to compile small custom range sets.
"""

from __future__ import annotations

import struct
from typing import Iterable, Optional

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"

# data-section type codes (spec §"Output Data Section")
_T_POINTER = 1
_T_STRING = 2
_T_DOUBLE = 3
_T_BYTES = 4
_T_UINT16 = 5
_T_UINT32 = 6
_T_MAP = 7
_T_INT32 = 8
_T_UINT64 = 9
_T_UINT128 = 10
_T_ARRAY = 11
_T_BOOL = 14
_T_FLOAT = 15


# ------------------------------------------------------------------ decoder


class _Decoder:
    """Typed-field decoder over one buffer (data or metadata section).

    ``base``: absolute offset the section starts at — pointer values
    are relative to it."""

    def __init__(self, buf: bytes, base: int = 0):
        self.buf = buf
        self.base = base

    def decode(self, offset: int):
        """Decode the field at absolute ``offset``; returns (value,
        next_offset)."""
        ctrl = self.buf[offset]
        offset += 1
        typ = ctrl >> 5
        if typ == 0:  # extended type: next byte + 7
            typ = self.buf[offset] + 7
            offset += 1
        if typ == _T_POINTER:
            return self._pointer(ctrl, offset)
        size, offset = self._size(ctrl, offset)
        if typ == _T_STRING:
            return self.buf[offset:offset + size].decode("utf-8"), offset + size
        if typ == _T_BYTES:
            return self.buf[offset:offset + size], offset + size
        if typ == _T_DOUBLE:
            return struct.unpack(">d", self.buf[offset:offset + 8])[0], offset + 8
        if typ == _T_FLOAT:
            return struct.unpack(">f", self.buf[offset:offset + 4])[0], offset + 4
        if typ in (_T_UINT16, _T_UINT32, _T_UINT64, _T_UINT128):
            return int.from_bytes(self.buf[offset:offset + size], "big"), offset + size
        if typ == _T_INT32:
            return int.from_bytes(self.buf[offset:offset + size], "big", signed=True), offset + size
        if typ == _T_BOOL:
            return bool(size), offset  # value lives in the size bits
        if typ == _T_MAP:
            out = {}
            for _ in range(size):
                k, offset = self.decode(offset)
                v, offset = self.decode(offset)
                out[k] = v
            return out, offset
        if typ == _T_ARRAY:
            items = []
            for _ in range(size):
                v, offset = self.decode(offset)
                items.append(v)
            return items, offset
        raise ValueError(f"mmdb: unsupported type {typ} at {offset - 1}")

    def _size(self, ctrl: int, offset: int) -> tuple[int, int]:
        size = ctrl & 0x1F
        if size < 29:
            return size, offset
        if size == 29:
            return 29 + self.buf[offset], offset + 1
        if size == 30:
            return 285 + int.from_bytes(self.buf[offset:offset + 2], "big"), offset + 2
        return 65821 + int.from_bytes(self.buf[offset:offset + 3], "big"), offset + 3

    def _pointer(self, ctrl: int, offset: int):
        ss = (ctrl >> 3) & 0x3
        vvv = ctrl & 0x7
        if ss == 0:
            val = (vvv << 8) | self.buf[offset]
            offset += 1
        elif ss == 1:
            val = ((vvv << 16) | int.from_bytes(self.buf[offset:offset + 2], "big")) + 2048
            offset += 2
        elif ss == 2:
            val = ((vvv << 24) | int.from_bytes(self.buf[offset:offset + 3], "big")) + 526336
            offset += 3
        else:
            val = int.from_bytes(self.buf[offset:offset + 4], "big")
            offset += 4
        value, _ = self.decode(self.base + val)
        return value, offset


# ------------------------------------------------------------------ reader


class MMDBReader:
    """Parsed .mmdb: metadata + search tree + data-section decoding."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        marker_at = self.buf.rfind(_METADATA_MARKER)
        if marker_at < 0:
            raise ValueError(f"{path}: no MaxMind.com metadata marker")
        meta, _ = _Decoder(self.buf).decode(marker_at + len(_METADATA_MARKER))
        self.metadata = meta
        self.node_count = meta["node_count"]
        self.record_size = meta["record_size"]
        self.ip_version = meta["ip_version"]
        if self.record_size not in (24, 28, 32):
            raise ValueError(f"unsupported record_size {self.record_size}")
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        # data section starts after the tree + 16-byte zero separator
        self._data = _Decoder(self.buf, base=self.tree_size + 16)

    # -- tree records
    def _record(self, node: int, side: int) -> int:
        off = node * self.node_bytes
        b = self.buf
        if self.record_size == 24:
            off += side * 3
            return int.from_bytes(b[off:off + 3], "big")
        if self.record_size == 32:
            off += side * 4
            return int.from_bytes(b[off:off + 4], "big")
        # 28-bit: middle byte's high nibble belongs to the left record,
        # low nibble to the right
        mid = b[off + 3]
        if side == 0:
            return ((mid >> 4) << 24) | int.from_bytes(b[off:off + 3], "big")
        return ((mid & 0x0F) << 24) | int.from_bytes(b[off + 4:off + 7], "big")

    def _data_at(self, record: int):
        # record > node_count: pointer into the data section; the
        # separator's 16 bytes are included in the offset arithmetic
        offset = self.tree_size + 16 + (record - self.node_count - 16)
        value, _ = self._data.decode(offset)
        return value

    def _ipv4_root(self) -> Optional[int]:
        """IPv4 subtree root: in an ip_version=6 tree, IPv4 addresses
        live under 96 leading zero bits."""
        node = 0
        if self.ip_version == 4:
            return node
        for _ in range(96):
            rec = self._record(node, 0)
            if rec >= self.node_count:
                return None  # no IPv4 data
            node = rec
        return node

    def lookup_ipv4(self, ip_int: int):
        """Decoded data record for one IPv4 address, or None."""
        node = self._ipv4_root()
        if node is None:
            return None
        for depth in range(31, -1, -1):
            rec = self._record(node, (ip_int >> depth) & 1)
            if rec == self.node_count:
                return None
            if rec > self.node_count:
                return self._data_at(rec)
            node = rec
        return None

    def ipv4_networks(self) -> Iterable[tuple[int, int, dict]]:
        """DFS-enumerate every IPv4 network: (start_ip, end_ip,
        decoded record). This is the load-time conversion to a
        relational range table — one pass, driver-side."""
        root = self._ipv4_root()
        if root is None:
            return
        # iterative DFS: (node, prefix, depth)
        stack = [(root, 0, 0)]
        while stack:
            node, prefix, depth = stack.pop()
            for side in (1, 0):  # push right first → left emitted first
                rec = self._record(node, side)
                p = (prefix << 1) | side
                if rec == self.node_count:
                    continue
                if rec > self.node_count:
                    start = p << (32 - depth - 1)
                    end = start + (1 << (32 - depth - 1)) - 1
                    yield start, end, self._data_at(rec)
                else:
                    stack.append((rec, p, depth + 1))


def extract_country(record: dict) -> Optional[str]:
    """country ISO code from a GeoLite2-Country-shaped record
    (``{"country": {"iso_code": ...}}``; falls back to
    registered_country like the CSV loader's geoname coalesce)."""
    for key in ("country", "registered_country"):
        c = record.get(key)
        if isinstance(c, dict) and c.get("iso_code"):
            return c["iso_code"]
    return None


def geo_range_table_from_mmdb(spark, path: str):
    """(start_ip, end_ip, country) DataFrame from a binary .mmdb —
    same schema/contract as ingest.geo_range_table_from_csv, so
    ``geoip_enrich(geo=...)`` takes either interchangeably."""
    reader = MMDBReader(path)
    rows = [
        (start, end, extract_country(rec))
        for start, end, rec in reader.ipv4_networks()
    ]
    return spark.createDataFrame(
        rows, "start_ip long, end_ip long, country string"
    )


# ------------------------------------------------------------------ writer


def _encode_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _ctrl(_T_STRING, len(raw)) + raw


def _ctrl(typ: int, size: int) -> bytes:
    """Control byte(s) for a non-extended type with size < 29."""
    if typ < 8:
        head, ext = typ, b""
    else:
        head, ext = 0, bytes([typ - 7])
    if size < 29:
        return bytes([(head << 5) | size]) + ext
    if size < 285:
        return bytes([(head << 5) | 29]) + ext + bytes([size - 29])
    raise ValueError("fixture writer supports sizes < 285")


def _encode_value(v) -> bytes:
    if isinstance(v, str):
        return _encode_string(v)
    if isinstance(v, bool):
        return bytes([(0 << 5) | int(v), _T_BOOL - 7])
    if isinstance(v, int):
        raw = v.to_bytes((v.bit_length() + 7) // 8, "big") if v else b""
        if v < 1 << 16:
            return _ctrl(_T_UINT16, len(raw)) + raw
        if v < 1 << 32:
            return _ctrl(_T_UINT32, len(raw)) + raw
        return _ctrl(_T_UINT64, len(raw)) + raw
    if isinstance(v, float):
        return _ctrl(_T_DOUBLE, 8) + struct.pack(">d", v)
    if isinstance(v, dict):
        out = _ctrl(_T_MAP, len(v))
        for k, val in v.items():
            out += _encode_string(k) + _encode_value(val)
        return out
    if isinstance(v, (list, tuple)):
        out = _ctrl(_T_ARRAY, len(v))
        for item in v:
            out += _encode_value(item)
        return out
    raise TypeError(f"cannot encode {type(v)}")


def build_mmdb(
    path: str,
    networks: Iterable[tuple[int, int, dict]],
    record_size: int = 24,
    ip_version: int = 4,
    database_type: str = "GeoLite2-Country",
) -> None:
    """Compile (network_int, prefix_len, record) triples into a valid
    .mmdb (spec-conformant: search tree → 16-byte separator → data
    section → metadata). Identical records share one data offset, like
    MaxMind's own writer. Test/fixture scale (tree must fit the chosen
    record size)."""
    if record_size not in (24, 28, 32):
        raise ValueError("record_size must be 24, 28 or 32")

    # --- trie build; leaves hold a data-record key
    LEFT, RIGHT, LEAF = 0, 1, 2
    root: list = [None, None, None]
    payloads: list[bytes] = []
    offsets: dict[bytes, int] = {}

    def payload_key(rec: dict) -> int:
        raw = _encode_value(rec)
        if raw not in offsets:
            offsets[raw] = sum(len(p) for p in payloads)
            payloads.append(raw)
        return offsets[raw]

    depth_bits = 32 if ip_version == 4 else 128
    for net, plen, rec in networks:
        if plen <= 0:
            # a /0 would be the whole address space; the loop below
            # would silently skip it — reject explicitly
            raise ValueError("prefix length must be >= 1")
        node = root
        for i in range(plen):
            bit = (net >> (depth_bits - 1 - i)) & 1
            if i == plen - 1:
                # the overlap guard must fire in BOTH insertion
                # orders: a leaf here (narrow-then-broad duplicate)
                # AND an internal subtree here (broad-after-narrow —
                # assigning a leaf would silently drop the subtree)
                if node[bit] is not None:
                    raise ValueError("overlapping networks unsupported")
                node[bit] = ("leaf", payload_key(rec))
            else:
                if isinstance(node[bit], tuple):
                    raise ValueError("overlapping networks unsupported")
                if node[bit] is None:
                    node[bit] = [None, None, None]
                node = node[bit]

    # --- number internal nodes (BFS keeps the root at 0)
    order: list[list] = []
    queue = [root]
    while queue:
        n = queue.pop(0)
        n[LEAF] = len(order)
        order.append(n)
        for side in (0, 1):
            child = n[side]
            if isinstance(child, list):
                queue.append(child)
    node_count = len(order)

    def record_value(child) -> int:
        if child is None:
            return node_count
        if isinstance(child, list):
            return child[LEAF]
        return node_count + 16 + child[1]  # data offset

    # --- serialize tree
    tree = bytearray()
    for n in order:
        l, r = record_value(n[0]), record_value(n[1])
        if record_size == 24:
            tree += l.to_bytes(3, "big") + r.to_bytes(3, "big")
        elif record_size == 32:
            tree += l.to_bytes(4, "big") + r.to_bytes(4, "big")
        else:  # 28
            tree += (l & 0xFFFFFF).to_bytes(3, "big")
            tree += bytes([((l >> 24) << 4) | (r >> 24)])
            tree += (r & 0xFFFFFF).to_bytes(3, "big")
        if max(l, r) >= 1 << record_size:
            raise ValueError("record_size too small for this database")

    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": 0,
        "database_type": database_type,
        "description": {"en": "optiprism_spark fixture"},
        "ip_version": ip_version,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": record_size,
    }
    with open(path, "wb") as f:
        f.write(bytes(tree))
        f.write(b"\x00" * 16)
        for p in payloads:
            f.write(p)
        f.write(_METADATA_MARKER)
        f.write(_encode_value(meta))
