"""Durable ingest journal — the reference write path's WAL analogue.

The reference acks a /track only after the row is in the WAL
(storage/src/db.rs:214-265: ``LogOp::Insert(key, values)`` + crc32,
fsync'd log file), then applies it to the memtable; on restart the
memtable is rebuilt by replaying the log. This module gives the HTTP
facade the same contract: ``append`` writes one length-prefixed,
crc32-framed JSON record and fsyncs BEFORE the 201 ack; ``replay``
rebuilds the in-process buffers after a crash, skipping a torn tail
record (the standard WAL recovery rule — a partial last record means
the crash happened mid-write, before the ack, so dropping it is
correct). ``truncate`` is the flush→truncate step after the buffered
batch is durably written into the events table
(storage/src/db.rs:779-790).

Record framing: ``<len u32 BE> <crc32 u32 BE> <payload bytes>`` where
payload = ``{"op": "track"|"identify", "row": {...}}`` JSON. CRC
covers the payload, as in the reference (db.rs:251-265).

Scale note: one facade process = one journal file, exactly like one
reference server = one WAL. A fleet of stateless receivers each keeps
its own journal (or substitutes an object-store/Kafka log); the Spark
side consumes replayed batches identically either way.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

def _frame(op: str, row: dict) -> bytes:
    """ONE record-framing implementation (length + crc32 header, json
    payload) shared by append and rewrite — framing drift between the
    two would make rewritten journals unreadable by replay."""
    payload = json.dumps({"op": op, "row": row}, sort_keys=True).encode()
    return _HEADER.pack(len(payload), zlib.crc32(payload)) + payload


_HEADER = struct.Struct(">II")  # payload length, crc32


class IngestWal:
    def __init__(self, wal_dir: str, name: str = "ingest.wal"):
        os.makedirs(wal_dir, exist_ok=True)
        self.path = os.path.join(wal_dir, name)
        # append mode creates on first use; kept open for the app's life
        self._f = open(self.path, "ab")

    def append(self, op: str, row: dict) -> None:
        """Write one record and fsync — the durability point the ack
        depends on (reference: WAL write precedes memtable apply)."""
        self._f.write(_frame(op, row))
        self._f.flush()
        os.fsync(self._f.fileno())

    def replay(self) -> tuple[list[dict], list[dict]]:
        """Rebuild (tracked, identified) buffers from the journal.
        Stops at the first torn/corrupt record — everything before it
        was acked and is recovered; the tail was never acked. The torn
        tail is then TRUNCATED away: the append handle writes at end
        of file, so leaving corrupt bytes in place would strand every
        subsequent fsync'd-and-acked record behind an unreadable
        region on the next replay (the reference recovery path
        rewrites the log from the last valid LSN for the same
        reason)."""
        tracked: list[dict] = []
        identified: list[dict] = []
        valid_end = 0
        try:
            with open(self.path, "rb") as f:
                while True:
                    header = f.read(_HEADER.size)
                    if len(header) < _HEADER.size:
                        break
                    n, crc = _HEADER.unpack(header)
                    payload = f.read(n)
                    if len(payload) < n or zlib.crc32(payload) != crc:
                        break  # torn tail: crash mid-write, pre-ack
                    rec = json.loads(payload)
                    (tracked if rec["op"] == "track" else identified).append(rec["row"])
                    valid_end = f.tell()
        except FileNotFoundError:
            return tracked, identified
        if os.path.getsize(self.path) > valid_end:
            # drop the torn tail so new appends follow valid data
            self._f.close()
            with open(self.path, "r+b") as f:
                f.truncate(valid_end)
                f.flush()
                os.fsync(f.fileno())
            self._f = open(self.path, "ab")
        return tracked, identified

    def truncate(self) -> None:
        """Reset the journal after a durable flush of the buffers."""
        self._f.close()
        self._f = open(self.path, "wb")
        self._f.close()
        self._f = open(self.path, "ab")

    def rewrite(self, records: list[tuple[str, dict]]) -> None:
        """Replace the journal contents with ``records`` (one fsync at
        the end) — the checkpoint-commit step: rows flushed durably
        elsewhere are dropped, rows acked since the checkpoint began
        stay journaled. Written via a temp file + atomic rename so a
        crash mid-rewrite leaves the OLD journal intact (at-least-once
        replay), never a half-written one."""
        tmp = self.path + ".rewrite"
        with open(tmp, "wb") as f:
            for op, row in records:
                f.write(_frame(op, row))
            f.flush()
            os.fsync(f.fileno())
        self._f.close()
        os.replace(tmp, self.path)
        self._f = open(self.path, "ab")

    def close(self) -> None:
        self._f.close()
