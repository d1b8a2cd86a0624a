"""Transaction-log table format ("deltalite") — Delta-style ACID tables
over plain parquet (reference analogue: dbt materialized='incremental'
merge semantics, models/silver/silver_orders.sql:1; north-star approach
line "DataFrame ops over Delta/Iceberg").

Neither delta-spark nor Iceberg runtime jars are installable in this
environment (no pip/apt), so this module implements the core of the
Delta protocol directly, the way Delta Lake itself does it (Armbrust et
al., "Delta Lake: High-Performance ACID Table Storage over Cloud Object
Stores", VLDB 2020):

- A table is a directory of immutable parquet data files plus a
  ``_txn_log/`` of JSON entries ``v{N}.json``; entry N lists the data
  files ADDED and REMOVED by version N with per-file row counts and
  min/max key stats.
- Readers replay the log to a version (time travel) and read exactly
  the live file set — O(versions) tiny JSON reads, no directory listing
  races.
- MERGE INTO rewrites ONLY the files that contain matched keys: touched
  files are discovered distributedly (join target-with-filename against
  source keys), pruned first by the log's min/max key stats. Untouched
  files carry over by reference — at 100 TB this is the whole point of
  the format: an incremental batch rewrites a few files, not the table.

Single-writer assumption: real Delta arbitrates concurrent commits via
optimistic concurrency on the log (putIfAbsent); this engine runs one
materialization driver, so version numbers are assigned locally. The
commit is still atomic for readers: data files land first, the JSON log
entry is renamed into place last.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LOG_DIR = "_txn_log"
_DATA_DIR = "data"


# ------------------------------------------------------------ log I/O


def _log_path(table: str) -> str:
    return os.path.join(table, _LOG_DIR)


def versions(table: str) -> list[int]:
    d = _log_path(table)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[1:-5]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
    )


def _read_entry(table: str, v: int) -> dict:
    with open(os.path.join(_log_path(table), f"v{v}.json")) as fh:
        return json.load(fh)


# ----------------------------------------------------- log checkpoints
#
# Replaying the log is a left fold over entries; at streaming commit
# rates (one MERGE + one APPEND per micro-batch) the log grows by
# thousands of versions and every read's replay cost grows with it —
# O(commits) per micro-batch means quadratic total work over a stream.
# The Delta answer: periodically snapshot the FOLDED state next to the
# log; replay = newest checkpoint at-or-below the target version + the
# entry tail. Checkpoints are an ACCELERATION, never the source of
# truth — unreadable/corrupt ones are skipped (older checkpoint or full
# replay), and time travel to any version, including pre-checkpoint
# ones, still works because entries are never deleted.

CHECKPOINT_INTERVAL = 20  # commits between state snapshots
CHECKPOINT_KEEP = 3  # newest checkpoints retained (older ones are GC'd)


def _empty_state() -> dict:
    return {
        "live": {},          # file name -> add action (insertion-ordered)
        "staged": {},        # staged version -> add actions (unresolved WAP)
        "tombstones": [],    # pending merge-on-read key tombstones
        "constraints": {},   # name -> boolean SQL expr
        "schema_json": None,
        "key": None,
        "partition_by": None,
        "zorder_by": [],
        # column mapping (RENAME/DROP COLUMN without data rewrite):
        # logical name -> physical parquet column name (identity
        # entries omitted), and physical names of DROPPED columns that
        # still exist inside immutable data files (reserved so a new
        # logical column can never collide with old file data)
        "mapping": {},
        "retired": [],
    }


def _fold_entry(state: dict, e: dict) -> dict:
    """Apply ONE log entry to a folded state — the single definition of
    replay semantics (live_files / pending_tombstones / current_schema /
    current_constraints / _table_key / _table_partition_by /
    _table_zorder_by / _unresolved_staged are all views of this fold)."""
    # table-level metadata folds on EVERY entry, including staged ones
    if e.get("key") is not None:
        state["key"] = e["key"]
    if e.get("schema_json"):
        state["schema_json"] = e["schema_json"]
    if "constraints" in e:
        state["constraints"] = dict(e["constraints"])
    if e.get("operation") in ("CREATE", "CREATE OR REPLACE") or str(
        e.get("operation", "")
    ).startswith("CLONE "):
        state["partition_by"] = e.get("partition_by")
        # a table redefinition resets the column mapping unless the
        # entry carries one (CLONE carries the source's)
        state["mapping"] = dict(e.get("column_mapping") or {})
        state["retired"] = list(e.get("retired_physical") or [])
        # a redefinition also resets PENDING TOMBSTONES (round-10
        # review): only a tombstones_cleared commit reset them before,
        # so a crash between a deferred delete and its materialization
        # left stale tombstones MOR-filtering the REPLACED table's
        # fresh rows forever. CLONE still carries the source's pending
        # set — the extend below re-adds the entry's own tombstones.
        state["tombstones"] = []
    if e.get("zorder_by"):
        state["zorder_by"] = list(e["zorder_by"])
    # RENAME/DROP COLUMN entries snapshot the full mapping (same
    # snapshot semantics as constraints)
    if "column_mapping" in e and not str(e.get("operation", "")).startswith(
        ("CREATE", "CLONE ")
    ):
        state["mapping"] = dict(e["column_mapping"])
    if "retired_physical" in e and not str(e.get("operation", "")).startswith(
        ("CREATE", "CLONE ")
    ):
        state["retired"] = list(e["retired_physical"])
    # RESTORE re-declares the ENTIRE table state of its target,
    # including the physical layout spec — partition_by otherwise only
    # folds on CREATE/CLONE, so restoring across a REPLACE would keep
    # the replaced table's partitioning on a pre-REPLACE file set.
    if str(e.get("operation", "")).startswith("RESTORE"):
        if "partition_by" in e:
            state["partition_by"] = e["partition_by"]
        if "zorder_by" in e:
            state["zorder_by"] = list(e["zorder_by"] or [])
        # key folds UNCONDITIONALLY on RESTORE (round-9 review): the
        # generic key fold above skips None, so restoring from a keyed
        # era to a key-less target would silently keep the newer key —
        # the same stale-state-across-RESTORE class as partition_by.
        if "key" in e:
            state["key"] = e["key"]
    if e.get("tombstones_cleared"):
        state["tombstones"] = []
    state["tombstones"].extend(e.get("tombstones", []))
    # file actions: write-audit-publish defers staged adds until a
    # PUBLISH names them; readers never see unpublished data
    if e.get("staged"):
        state["staged"][int(e["version"])] = e.get("add", [])
        return state
    if e.get("publishes") is not None:
        for a in state["staged"].pop(int(e["publishes"]), []):
            state["live"][a["file"]] = a
        return state
    if e.get("discards") is not None:
        state["staged"].pop(int(e["discards"]), None)
        return state
    for r in e.get("remove", []):
        state["live"].pop(r, None)
    for a in e.get("add", []):
        state["live"][a["file"]] = a
    return state


def _ckpt_path(table: str, v: int) -> str:
    return os.path.join(_log_path(table), f"ckpt-v{v}.json")


def _latest_checkpoint(table: str, version: int):
    """(ckpt_version, state) of the newest readable checkpoint at or
    below ``version``, or None."""
    import re as _re

    d = _log_path(table)
    if not os.path.isdir(d):
        return None
    cands = sorted(
        (
            int(m.group(1))
            for f in os.listdir(d)
            if (m := _re.fullmatch(r"ckpt-v(\d+)\.json", f))
        ),
        reverse=True,
    )
    for cv in cands:
        if cv > version:
            continue
        try:
            with open(_ckpt_path(table, cv)) as fh:
                raw = json.load(fh)
            if raw.get("version") != cv:
                continue
            st = _empty_state()
            st["live"] = {a["file"]: a for a in raw["live"]}
            st["staged"] = {int(k): v for k, v in raw["staged"].items()}
            st["tombstones"] = list(raw["tombstones"])
            st["constraints"] = dict(raw["constraints"])
            st["schema_json"] = raw["schema_json"]
            st["key"] = raw["key"]
            st["partition_by"] = raw["partition_by"]
            st["zorder_by"] = list(raw["zorder_by"])
            # pre-mapping checkpoints lack these keys: identity mapping
            st["mapping"] = dict(raw.get("mapping") or {})
            st["retired"] = list(raw.get("retired") or [])
            return cv, st
        except Exception:
            continue  # corrupt/partial checkpoint: try an older one
    return None


def _state_at(table: str, version: int) -> dict:
    """The folded table state as of ``version`` (inclusive), seeded
    from the newest usable checkpoint. Caller validates the version."""
    ck = _latest_checkpoint(table, version)
    if ck is not None:
        start_v, state = ck
    else:
        start_v, state = -1, _empty_state()
    for v in versions(table):
        if v <= start_v:
            continue
        if v > version:
            break
        state = _fold_entry(state, _read_entry(table, v))
    return state


def _maybe_write_checkpoint(table: str, version: int) -> None:
    """Snapshot the folded state every CHECKPOINT_INTERVAL commits.
    Failures are swallowed: a missing checkpoint only costs replay
    time, while a failed commit would lose a real write."""
    if version <= 0 or version % CHECKPOINT_INTERVAL != 0:
        return
    try:
        st = _state_at(table, version)
        payload = {
            "version": version,
            "live": list(st["live"].values()),
            "staged": {str(k): v for k, v in st["staged"].items()},
            "tombstones": st["tombstones"],
            "constraints": st["constraints"],
            "schema_json": st["schema_json"],
            "key": st["key"],
            "partition_by": st["partition_by"],
            "zorder_by": st["zorder_by"],
            "mapping": st["mapping"],
            "retired": st["retired"],
        }
        tmp = os.path.join(
            _log_path(table), f".ckpt-tmp-{uuid.uuid4().hex}.json"
        )
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, _ckpt_path(table, version))  # atomic publish
        # retention: checkpoints are pure acceleration, so GC all but
        # the newest CHECKPOINT_KEEP — old time travel still works via
        # longer replay; keeping >1 also preserves the corrupt-newest
        # fallback. At a multi-MB state per checkpoint, unbounded
        # retention would grow the log dir O(commits/interval).
        import re as _re

        d = _log_path(table)
        cands = sorted(
            int(m.group(1))
            for f in os.listdir(d)
            if (m := _re.fullmatch(r"ckpt-v(\d+)\.json", f))
        )
        for cv in cands[:-CHECKPOINT_KEEP]:
            os.unlink(_ckpt_path(table, cv))
    except Exception:
        pass


class CommitConflict(Exception):
    """Another writer committed this version first (optimistic
    concurrency, Delta's ConcurrentModificationException). The loser
    re-reads the log and retries its operation against the new HEAD."""


class ConcurrentWriteConflict(CommitConflict):
    """Typed ABORT after conflict classification: the concurrent commit
    invalidated this transaction's snapshot (an overlapping rewrite, a
    schema/constraint/tombstone change), so rebasing onto the new HEAD
    would be unsound — Delta's ConcurrentDeleteRead / MetadataChanged
    class. The caller must re-run the whole operation against current
    table state. Contrast with plain :class:`CommitConflict`, which
    add-only transactions recover from automatically via
    :func:`_commit_rebase` (Delta's ConcurrentAppend rebase)."""


# Log operations an ADD-ONLY transaction can safely rebase across: they
# add or rewrite files this transaction never read, and leave table-level
# state (schema, key, partitioning, constraints, tombstones) unchanged.
# Anything else — CREATE OR REPLACE, RESTORE, DELETE DEFERRED,
# ADD/DROP CONSTRAINT — redefines state the append's validation depended
# on, so the append must abort and re-validate.
_APPEND_REBASE_SAFE_OPS = {
    "APPEND",
    "APPEND STAGED",
    "MERGE",
    "OPTIMIZE",
    "DELETE",
    "MATERIALIZE TOMBSTONES",
    "PUBLISH",
    "DISCARD",
}


def _append_rebase_conflict(e: dict, expected_schema: str | None) -> str | None:
    """Why log entry ``e`` forbids rebasing an add-only commit across
    it; None when it is benign."""
    op = str(e.get("operation", "?"))
    if op not in _APPEND_REBASE_SAFE_OPS:
        return f"concurrent {op} (v{e.get('version')}) redefines table state"
    if e.get("tombstones"):
        return f"concurrent {op} (v{e.get('version')}) introduced key tombstones"
    if "constraints" in e:
        return (
            f"concurrent {op} (v{e.get('version')}) changed CHECK constraints; "
            "this append's rows were not validated against them"
        )
    if (
        expected_schema is not None
        and e.get("schema_json") is not None
        and e["schema_json"] != expected_schema
    ):
        # a rebased append entry would re-commit OUR (stale) schema_json
        # as the log schema, silently regressing the evolution
        return f"concurrent {op} (v{e.get('version')}) evolved the schema"
    return None


def _commit_rebase(table: str, entry: dict, max_retries: int = 10) -> int:
    """Optimistic commit for ADD-ONLY entries (``remove == []``): on a
    version collision, classify every intervening commit; if all are
    rebase-safe, bump the version and re-commit (Delta's
    ConcurrentAppend resolution — disjoint writers serialize instead of
    failing), else raise :class:`ConcurrentWriteConflict`."""
    if entry.get("remove"):
        raise ValueError("_commit_rebase is only sound for add-only entries")
    expected_schema = entry.get("schema_json")
    attempts = 0
    while True:
        try:
            _commit(table, entry)
            return entry["version"]
        except ConcurrentWriteConflict:
            raise
        except CommitConflict:
            vs = versions(table)
            for v in vs:
                if v < entry["version"]:
                    continue
                reason = _append_rebase_conflict(_read_entry(table, v), expected_schema)
                if reason is not None:
                    raise ConcurrentWriteConflict(
                        f"{entry.get('operation')} on {table} aborted: {reason}; "
                        "re-run against current table state"
                    ) from None
            attempts += 1
            if attempts > max_retries:
                raise ConcurrentWriteConflict(
                    f"{entry.get('operation')} on {table} lost the commit race "
                    f"{attempts} times; giving up"
                ) from None
            entry["version"] = vs[-1] + 1


def _commit_exclusive(table: str, entry: dict) -> None:
    """Commit for transactions that READ table state they then rewrite
    or redefine (MERGE, OPTIMIZE, DELETE, RESTORE, REPLACE, constraint
    and tombstone changes): ANY concurrent commit may have changed what
    this transaction read — files it rewrites, rows a predicate
    matched, state it validated — so a version collision is always a
    typed abort, never a blind retry (Delta's ConcurrentDeleteRead
    conservatism)."""
    try:
        _commit(table, entry)
    except CommitConflict as ex:
        raise ConcurrentWriteConflict(
            f"{entry.get('operation')} on {table} aborted: {ex}; the snapshot "
            "this transaction read was invalidated by a concurrent commit — "
            "re-run the operation against current table state"
        ) from None


def _commit(table: str, entry: dict) -> None:
    """Write the log entry with PUT-IF-ABSENT semantics: the payload
    lands in a tmp file, then os.link() publishes it — link(2) is
    atomic AND fails with EEXIST if the version already exists. A bare
    rename() would silently OVERWRITE a concurrent writer's commit of
    the same version (lost update); link is the posix equivalent of the
    object-store conditional put Delta's commit protocol requires."""
    d = _log_path(table)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(entry, fh, indent=1)
    try:
        os.link(tmp, os.path.join(d, f"v{entry['version']}.json"))
    except FileExistsError:
        raise CommitConflict(
            f"version {entry['version']} of {table} was committed concurrently"
        ) from None
    finally:
        os.unlink(tmp)
    _maybe_write_checkpoint(table, entry["version"])


def live_files(table: str, version: int | None = None) -> list[dict]:
    """The live add-actions (file name + stats) as of ``version``
    (inclusive; default latest) — checkpoint-seeded replay."""
    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"not a deltalite table: {table}")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise ValueError(f"version {version} not in {vs}")
    return list(_state_at(table, version)["live"].values())


def _unresolved_staged(table: str) -> dict[int, list]:
    """Staged commits not yet published or discarded."""
    vs = versions(table)
    if not vs:
        return {}
    return _state_at(table, vs[-1])["staged"]


def history(table: str) -> list[dict]:
    """Version → operation summary (the DESCRIBE HISTORY equivalent)."""
    out = []
    for v in versions(table):
        e = _read_entry(table, v)
        out.append(
            {
                "version": v,
                "operation": e["operation"],
                "timestamp": e["timestamp"],
                "n_added": len(e.get("add", [])),
                "n_removed": len(e.get("remove", [])),
            }
        )
    return out


# ------------------------------------------------------------ data files


def _footer_min_max(md, col: str):
    """(min, max) of ``col`` across a parquet file's row groups, from the
    footer statistics pyarrow reads for free; None if unavailable."""
    import decimal

    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    if col not in idx or md.num_rows == 0:
        return None
    colschema = md.schema.column(idx[col])
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        s = md.row_group(rg).column(idx[col]).statistics
        if s is None or not s.has_min_max:
            # ANY stats-less row group makes the file's range unknowable:
            # bounds from the remaining groups would be too narrow and
            # stats-pruning would silently skip rows (round-7 review) —
            # record nothing, readers then keep the file conservatively
            return None
        try:
            mins.append(s.min)
            maxs.append(s.max)
        except Exception:
            # pyarrow can't logical-cast every stat (INT32/INT64-backed
            # decimals raise ArrowNotImplementedError). For decimals the
            # raw physical stat is the UNSCALED integer — rescale it
            # ourselves; anything else stays conservatively stats-less.
            if str(colschema.logical_type).startswith("Decimal") and (
                colschema.physical_type in ("INT32", "INT64")
            ):
                q = decimal.Decimal(1).scaleb(-colschema.scale)
                mins.append(decimal.Decimal(s.min_raw).scaleb(-colschema.scale).quantize(q))
                maxs.append(decimal.Decimal(s.max_raw).scaleb(-colschema.scale).quantize(q))
            else:
                return None
    return (min(mins), max(maxs)) if mins else None


# Per-file bloom filter on the table key: BLOOM_BITS-bit filter,
# BLOOM_K positions per key via seeded xxhash64. min/max footer stats
# prune RANGE predicates but are useless when every file spans the full
# key range (hash-partitioned writes); the bloom prunes POINT lookups
# there — Delta's bloom-filter-index idea, kept in the log entry itself
# (256 hex chars per file, metadata-scale).
BLOOM_BITS = 1024
BLOOM_K = 4

# merge_into: the bounded source probe (key + bloom positions, ONE job,
# LIMIT early-exits the scan). At or under the dial the MERGE resolves
# key range, bloom masks and the touched-file set driver-side (three
# Spark jobs saved — the fixed overhead that dominated churn-scale
# micro-batch MERGEs); above it the generic distributed path runs and
# bloom pruning is skipped (masks saturate at >~1k keys anyway, and
# collecting every distinct key was unbounded driver memory).
# 20k, not the initial 100k (round 14): every small-path perk is dead
# weight well below 100k keys — bloom masks saturate >~1k, the isin
# rewrite caps at MERGE_ISIN_MAX_KEYS=10k, and pyarrow discovery's
# per-value set probes are serial driver work — so a 75k-row source
# paid a 75k-row driver collect (with bloom-position arrays) for zero
# pruning power; measured 1.6 s off lakehouse_snapshot_cut's bump
# MERGE at sf0.1 by routing it to the distributed path instead.
MERGE_SOURCE_PROBE_MAX_ROWS = 20_000

# merge_into: per-key bloom masks are only worth computing while the
# union mask stays unsaturated — with BLOOM_BITS=1024 and BLOOM_K=4,
# ~500 keys already set >85% of the bits and pruning power is ~zero
# well before 2k. Above this dial the bloom-prune stage is skipped
# entirely (stats pruning + exact discovery still run), which also
# bounds the driver-side Python hashing of the round-15 full-row probe.
BLOOM_PROBE_MAX_KEYS = 2_048

# merge_into: when the exact row bound (logged touched-file rows +
# probed source rows) fits under this, the rewrite runs as one task and
# writes one file — churn-scale MERGEs otherwise fragment the table
# into N near-empty files per batch.
MERGE_COALESCE_MAX_ROWS = 2_000_000

# _stage_files: staged files at or under this many rows get their key
# bloom computed driver-side (local pyarrow column read + the bit-exact
# Python XXH64 twin of _bloom_positions) instead of a second Spark job
# re-reading files just written. A 100 TB-scale write has files above
# the dial and keeps the distributed pass. This per-file dial also
# bounds the pyarrow reads in read_keys_local/_driver_exact_touched
# (C-speed column decode + set probes — cheap per row).
BLOOM_DRIVER_MAX_ROWS = 250_000

# _stage_files driver-bloom path, TOTAL-rows dial (round 14 fix): the
# Python XXH64 twin costs ~15 µs/key single-threaded on the DRIVER, so
# the local path must be reserved for churn-scale commits (streaming
# label/verdict MERGEs, CDC micro-batches — at most thousands of rows).
# The initial round-14 cut gated only per-file size, so a data-scale
# CREATE whose shuffle happened to produce many sub-250k files paid
# O(total rows) of serial driver hashing — measured +2–7 s on every
# sf0.1 lakehouse gate (BENCH r14 before: lakehouse_zorder_prune 2.7 →
# 6.9 s, snapshot_cut 7.7 → 14.9 s). Above this TOTAL the one
# distributed _stage_blooms pass (32-way, JVM xxhash64 codegen) is
# strictly cheaper.
BLOOM_DRIVER_MAX_STAGE_ROWS = 20_000

# merge_into small path: up to this many probed source keys the
# touched-row anti-join is expressed as an isin() filter inside the
# rewrite job (no separate broadcast-build); above it, the join.
MERGE_ISIN_MAX_KEYS = 10_000

# merge_into small path: exact touched-file discovery runs driver-side
# (pyarrow key-column reads, no Spark job) when the candidate set is at
# most this many files, each under BLOOM_DRIVER_MAX_ROWS rows; above
# either bound the distributed semi-join discovery decides.
MERGE_DRIVER_DISCOVERY_MAX_FILES = 64


def _sql_literal(v) -> str:
    """A Python key value as a Spark SQL literal. repr()/str() alone
    mis-render non-int keys: str(date(2024,1,1)) parses as the
    arithmetic expression 2024-01-01 = 2022 inside an IN list
    (round-7 review)."""
    import datetime

    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _json_stat(v, side: str | None = None):
    """A footer stat value as it is stored in the JSON log: primitives
    pass through; date/timestamp become their ISO form (lexicographic
    order == logical order for ISO strings, so range pruning compares
    correctly when the probe bound is converted the same way).

    Decimal must NOT be stringified: '15.00' < '9.00' lexicographically,
    so a decimal-keyed MERGE would silently skip files whose range
    contains the source keys (round-8 ADVICE). Decimals are stored as
    floats, widened one ulp toward the stat's unsafe direction
    (``side='lo'`` → down, ``side='hi'`` → up) so the float range always
    CONTAINS the exact decimal range and pruning stays sound."""
    import decimal
    import math

    if isinstance(v, decimal.Decimal):
        f = float(v)
        if side == "lo":
            return math.nextafter(f, -math.inf)
        if side == "hi":
            return math.nextafter(f, math.inf)
        return f
    return v if isinstance(v, (int, float, str)) else str(v)


def _bloom_positions(col):
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(BLOOM_BITS)) for i in range(BLOOM_K)]
    )


# --- pure-Python XXH64, bit-exact vs Spark's xxhash64 expression -----------
# Spark evaluates xxhash64(col, lit(i)) by chaining: hash = XXH64(col bytes,
# seed=42), then hash = XXH64.hashInt(i, seed=hash) (the literal is an
# IntegerType). Re-implementing both legs lets churn-scale MERGEs compute
# per-file bloom masks driver-side — no second Spark job over the staged
# files. The implementation is property-pinned bit-for-bit against the
# Spark expression in tests/test_lakehouse.py (random unicode strings and
# random longs, all BLOOM_K seeds); a mismatch here would mean bloom false
# NEGATIVES (skipped matches — data corruption), which is why the driver
# path is only taken for key types whose string cast is trivially
# replicable (int/long/string) and the pin is a standing test.

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _xxh64_int(i: int, seed: int) -> int:
    h = (seed + _P5 + 4) & _M64
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _fmix(h)


def _xxh64_long(l: int, seed: int) -> int:
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl((l * _P2) & _M64, 31) * _P1) & _M64
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def _xxh64_bytes(data: bytes, seed: int) -> int:
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while off <= n - 32:
            k = int.from_bytes(data[off : off + 8], "little")
            v1 = (_rotl((v1 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[off + 8 : off + 16], "little")
            v2 = (_rotl((v2 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[off + 16 : off + 24], "little")
            v3 = (_rotl((v3 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[off + 24 : off + 32], "little")
            v4 = (_rotl((v4 + k * _P2) & _M64, 31) * _P1) & _M64
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while off <= n - 8:
        k = int.from_bytes(data[off : off + 8], "little")
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        off += 8
    if off <= n - 4:
        k = int.from_bytes(data[off : off + 4], "little")
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        off += 1
    return _fmix(h)


def _bloom_mask_py(values) -> int:
    """Bloom bitmask over string-cast key values — the driver-side twin
    of ``_bloom_positions`` + the mask fold. ``values``: iterable of
    already-string-cast keys (or None, matching Spark's null handling:
    a null column is skipped by xxhash64, so only the seed literal is
    hashed)."""
    mask = 0
    for v in values:
        for i in range(BLOOM_K):
            if v is None:
                h = _xxh64_int(i, 42)
            else:
                h = _xxh64_int(i, _xxh64_bytes(v.encode("utf-8"), 42))
            # Spark pmod on a SIGNED 64-bit hash
            signed = h - (1 << 64) if h >= (1 << 63) else h
            mask |= 1 << (signed % BLOOM_BITS)
    return mask


def _stage_blooms(df: DataFrame, staging: str, key: str) -> dict[str, int]:
    """staging-file basename → bloom bitmask of its key values (one
    distributed pass over the just-written files; per-file output is at
    most BLOOM_BITS distinct positions — metadata-scale collect)."""
    spark = df.sparkSession
    pos = (
        # explicit schema: the staged files were just written from df,
        # so inference would only re-list the directory and re-read
        # footers for a schema already in hand
        spark.read.schema(df.schema).parquet(staging)
        .select(
            F.input_file_name().alias("f"),
            F.explode(_bloom_positions(F.col(key).cast("string"))).alias("p"),
        )
        .distinct()
        .groupBy("f")
        .agg(F.collect_set("p").alias("ps"))
        .collect()
    )
    out: dict[str, int] = {}
    for r in pos:
        mask = 0
        for p in r["ps"]:
            mask |= 1 << int(p)
        out[os.path.basename(r["f"])] = mask
    return out


def _effective_stats_cols(
    table: str, columns, stats_cols: list[str] | None
) -> list[str]:
    """The stats columns a staged file must carry: the caller's list
    plus the table's DECLARED partition column (most recent CREATE) and
    the most recent OPTIMIZE's zorder columns — every rewrite path must
    keep those columns' stats on the files it writes or pruning would
    decay with table churn (round-7 fix). ONE definition shared by the
    distributed and driver-side staging writers so they cannot diverge."""
    stats_cols = list(stats_cols or [])
    part_col = _table_partition_by(table)
    for c in ([part_col] if part_col is not None else []) + _table_zorder_by(table):
        if c in columns and c not in stats_cols:
            stats_cols.append(c)
    return stats_cols


def _stage_files(
    df: DataFrame,
    table: str,
    key: str | None,
    stats_cols: list[str] | None = None,
    mapping: dict[str, str] | None = None,
) -> list[dict]:
    """Write df's partitions as immutable parquet files under data/ and
    return their add-actions (with per-file min/max stats on ``key`` and
    each of ``stats_cols`` from the parquet footers, plus a key bloom).

    The table's DECLARED partition column (most recent CREATE) and the
    most recent OPTIMIZE's zorder columns are always added to
    ``stats_cols``: every rewrite path — MERGE touched files, DELETE,
    OPTIMIZE — must keep those columns' stats on the files it writes,
    or each rewrite would silently turn skippable files into
    always-read ones and pruning would decay with table churn
    (round-7 fix; min/max stats stay sound on any layout)."""
    stats_cols = _effective_stats_cols(table, df.columns, stats_cols)
    # write boundary of the column mapping: files always carry PHYSICAL
    # names (key/partition/zorder/stats columns are rename-protected,
    # so every name this function addresses is identity-mapped). None =
    # current table state; CREATE paths pass {} (a replaced table's old
    # mapping must not leak into the new table's files).
    if mapping is None:
        vs = versions(table)
        mapping = _state_at(table, vs[-1])["mapping"] if vs else {}
    df = _map_to_physical(df, mapping)
    staging = os.path.join(table, f"_staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    blooms: dict[str, int] = {}
    if key is not None:
        # Driver-side bloom for small staged files (round 14): the
        # bit-exact Python XXH64 twin of _bloom_positions reads the key
        # column locally via pyarrow — no second Spark job over files a
        # churn-scale MERGE just wrote. Only for key types whose
        # cast-to-string Spark semantics are trivially replicable
        # (int/long: str(); string: identity); anything else, or any
        # file above the dial, takes the existing distributed pass.
        ktype = df.schema[key].dataType.typeName() if key in df.columns else None
        staged = [
            f for f in sorted(os.listdir(staging)) if f.endswith(".parquet")
        ]
        # decide the path from footer metadata FIRST (cheap driver
        # reads) so no file is ever read twice: the driver path only
        # runs when EVERY staged file is under the per-file dial AND
        # the commit is churn-scale in total — the pure-Python hashing
        # is serial driver work, ~15 µs/key, so a data-scale CREATE
        # must take the one distributed pass instead (round-14 fix;
        # see BLOOM_DRIVER_MAX_STAGE_ROWS)
        # ktype short-circuit FIRST, and stop reading footers as soon as
        # the running total proves the driver path ineligible — a large
        # multi-file commit must not pay one driver footer open per
        # staged file for a path it can never take (ADVICE r14)
        all_small = ktype in ("integer", "long", "string")
        if all_small:
            total = 0
            for f in staged:
                n = pq.ParquetFile(os.path.join(staging, f)).metadata.num_rows
                total += n
                if n > BLOOM_DRIVER_MAX_ROWS or total > BLOOM_DRIVER_MAX_STAGE_ROWS:
                    all_small = False
                    break
        if all_small:
            for f in staged:
                col = (
                    pq.read_table(os.path.join(staging, f), columns=[key])
                    .column(0)
                    .to_pylist()
                )
                blooms[f] = _bloom_mask_py(
                    v if (v is None or ktype == "string") else str(v)
                    for v in col
                )
        else:
            blooms = _stage_blooms(df, staging, key)
    data_dir = os.path.join(table, _DATA_DIR)
    os.makedirs(data_dir, exist_ok=True)
    adds: list[dict] = []
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        name = f"part-{uuid.uuid4().hex}.parquet"
        src = os.path.join(staging, f)
        md = pq.ParquetFile(src).metadata
        stats: dict = {"file": name, "rows": md.num_rows}
        if key is not None:
            mm = _footer_min_max(md, key)
            if mm is not None:
                # same ISO-stringify rule as col_stats below: a
                # date/timestamp/decimal KEY must not crash the JSON
                # commit (round-7 review); consumers convert their
                # probe bounds with _json_stat so comparisons stay
                # order-preserving (ISO strings for dates, ulp-widened
                # floats for decimals)
                stats["min_key"] = _json_stat(mm[0], side="lo")
                stats["max_key"] = _json_stat(mm[1], side="hi")
            if f in blooms:
                stats["bloom"] = format(blooms[f], f"0{BLOOM_BITS // 4}x")
        col_stats = {}
        for c in stats_cols or []:
            mm = _footer_min_max(md, c)
            if mm is not None:
                # log entries are JSON: date/timestamp/binary stats are
                # stored as ISO strings (lexicographic == chronological,
                # so range pruning compares correctly against ISO bounds)
                col_stats[c] = [
                    _json_stat(mm[0], side="lo"),
                    _json_stat(mm[1], side="hi"),
                ]
        if col_stats:
            stats["col_stats"] = col_stats
        os.rename(src, os.path.join(data_dir, name))
        adds.append(stats)
    shutil.rmtree(staging, ignore_errors=True)
    return adds


# ------------------------------------------- driver-side staging write
# Round 15 (VERDICT r14 #1/#4): the per-commit fixed cost of a
# metadata-scale write is ~one Spark job of pure scheduling (the staging
# parquet write; for a partitioned CREATE also a distinct-count job and
# a repartitionByRange sample job) — multiplied across every micro-batch
# of the streaming gates. When a commit's rows are ALREADY
# driver-resident (a createDataFrame LocalRelation, or a churn-scale
# MERGE whose bounded probe holds the full source), the staged file is
# written directly with pyarrow and its stats/bloom computed by the
# bit-exact Python twins — ZERO Spark jobs. The dial below bounds the
# driver work; everything above it takes the distributed writer.
STAGE_DRIVER_MAX_ROWS = 20_000

# Spark types whose pyarrow write is value-exact under Spark's parquet
# reader (ints/floats/bool/string/date, and arrays thereof). Timestamps
# and decimals are deliberately EXCLUDED: their parquet logical-type
# annotations (isAdjustedToUTC, precision/scale) depend on writer
# session config and are not trivially replicable — those schemas take
# the distributed writer.
_PA_SCALARS = {
    "byte": "int8",
    "short": "int16",
    "integer": "int32",
    "long": "int64",
    "float": "float32",
    "double": "float64",
    "boolean": "bool_",
    "string": "string",
    "date": "date32",
}

# key/partition/zorder/stats columns additionally need Python min/max
# and _json_stat semantics to match the footer-stat path exactly;
# floats are excluded (NaN makes Python min/max unordered).
_PA_STAT_TYPES = {"byte", "short", "integer", "long", "string", "date", "boolean"}


def _pa_type(dt):
    """pyarrow DataType for a Spark DataType, or raises KeyError."""
    import pyarrow as pa

    tn = dt.typeName()
    if tn == "array":
        return pa.list_(getattr(pa, _PA_SCALARS[dt.elementType.typeName()])())
    return getattr(pa, _PA_SCALARS[tn])()


def _stage_local_ok(schema, key: str | None, stats_cols: list[str]) -> bool:
    """True iff the driver-side staging writer can replicate the
    distributed one exactly for this schema: every column's type has a
    value-exact pyarrow twin, the key (if any) is a type whose
    cast-to-string bloom is replicable (int/long/string — the same gate
    as every other driver path), and every stats column totally orders
    in Python the way footer stats do."""
    types = {f.name: f.dataType for f in schema.fields}
    try:
        for dt in types.values():
            _pa_type(dt)
    except KeyError:
        return False
    if key is not None and (
        key not in types
        or types[key].typeName() not in ("integer", "long", "string")
    ):
        return False
    for c in stats_cols:
        if c in types and types[c].typeName() not in _PA_STAT_TYPES:
            return False
    return True


def _stage_rows_local(
    table: str,
    rows: list,
    schema,
    key: str | None,
    stats_cols: list[str] | None = None,
    mapping: dict[str, str] | None = None,
    partition_by: str | None = None,
) -> list[dict]:
    """Driver-side twin of :func:`_stage_files` for rows already in
    hand (POSITIONAL tuples/Rows in schema field order): immutable
    parquet files written with pyarrow under data/, min/max stats
    computed exactly from the values (sound by construction — the stats
    describe precisely the rows written), the key bloom via the
    test-pinned Python XXH64 twin. Caller gates on
    :func:`_stage_local_ok` and the row dial.

    ``partition_by`` writes ONE FILE PER VALUE — exactly the layout
    _apply_partitioning's repartitionByRange(#distinct) produces, so
    downstream file-skipping on the clustering column (the codes
    table's list_id probe, the labels table's relabel reads) keeps its
    pruning power. Unpartitioned rows land in one file (the
    metadata-scale analogue of the MERGE repartition(1) rule)."""
    import pyarrow as pa

    stats_cols = _effective_stats_cols(
        table, [f.name for f in schema.fields], stats_cols
    )
    if mapping is None:
        vs = versions(table)
        mapping = _state_at(table, vs[-1])["mapping"] if vs else {}
    names = [f.name for f in schema.fields]
    ktype = {f.name: f.dataType.typeName() for f in schema.fields}.get(key)
    data_dir = os.path.join(table, _DATA_DIR)
    os.makedirs(data_dir, exist_ok=True)
    pa_schema = pa.schema(
        [pa.field(mapping.get(f.name, f.name), _pa_type(f.dataType))
         for f in schema.fields]
    )
    pa_types = [_pa_type(f.dataType) for f in schema.fields]

    if partition_by is not None and partition_by in names:
        pi = names.index(partition_by)
        groups: dict = {}
        for r in rows:
            groups.setdefault(r[pi], []).append(r)
        buckets = [
            groups[v]
            for v in sorted(groups, key=lambda v: (v is not None, v))
        ] or [[]]  # empty source still stages one schema-carrying file
    else:
        buckets = [list(rows)]

    def _mm(vals):
        nn = [v for v in vals if v is not None]
        return (min(nn), max(nn)) if nn else None

    adds: list[dict] = []
    for bucket in buckets:
        cols = {n: [r[i] for r in bucket] for i, n in enumerate(names)}
        name = f"part-{uuid.uuid4().hex}.parquet"
        pq.write_table(
            pa.Table.from_arrays(
                [pa.array(cols[n], type=t) for n, t in zip(names, pa_types)],
                schema=pa_schema,
            ),
            os.path.join(data_dir, name),
            compression="snappy",
        )
        stats: dict = {"file": name, "rows": len(bucket)}
        if key is not None and key in cols:
            mm = _mm(cols[key])
            if mm is not None:
                stats["min_key"] = _json_stat(mm[0], side="lo")
                stats["max_key"] = _json_stat(mm[1], side="hi")
            mask = _bloom_mask_py(
                v if (v is None or ktype == "string") else str(v)
                for v in cols[key]
            )
            stats["bloom"] = format(mask, f"0{BLOOM_BITS // 4}x")
        col_stats = {}
        for c in stats_cols:
            if c not in cols:
                continue
            mm = _mm(cols[c])
            if mm is not None:
                col_stats[c] = [
                    _json_stat(mm[0], side="lo"),
                    _json_stat(mm[1], side="hi"),
                ]
        if col_stats:
            stats["col_stats"] = col_stats
        adds.append(stats)
    return adds


def _stats_disjoint(stat_lo, stat_hi, lo, hi) -> bool:
    """True iff the logged stat range [stat_lo, stat_hi] PROVABLY misses
    the probe range [lo, hi]. The log is immutable and generations mix:
    pre-round-8 entries rendered decimal stats as strings, current
    entries store ulp-widened floats — so mixed str/number pairs coerce
    to float before comparing, and any pair that still cannot compare
    keeps the file (returns False). Pruning must stay SOUND across log
    generations, never crash or mis-skip on an old entry."""

    def _coerce(a, b):
        if (
            isinstance(a, str)
            and isinstance(b, (int, float))
            and not isinstance(b, bool)
        ):
            try:
                a = float(a)
            except ValueError:
                return None
        if (
            isinstance(b, str)
            and isinstance(a, (int, float))
            and not isinstance(a, bool)
        ):
            try:
                b = float(b)
            except ValueError:
                return None
        return a, b

    try:
        p = _coerce(stat_hi, lo)
        if p is not None and p[0] < p[1]:
            return True
        p = _coerce(stat_lo, hi)
        return p is not None and p[0] > p[1]
    except TypeError:
        return False


def files_maybe_containing(
    spark: SparkSession, table: str, values: list, version: int | None = None
) -> list[dict]:
    """Point-lookup file skipping: the live files whose key stats AND
    bloom admit at least one of ``values``. Sound (never drops a file
    that holds a probed key — test-pinned); a file without a bloom entry
    is always a candidate. The probe positions are computed by the SAME
    seeded-xxhash64 expression the writer used, via one tiny Spark job —
    and the probe STRINGS are rendered by Spark's own cast from the
    key's native type, never Python ``str()``: the renderings diverge
    for bool (``True`` vs ``true``) and large floats (``1e+20`` vs
    ``1.0E20``), which would produce bloom false negatives and silently
    skip files that do contain the probed keys (round-8 ADVICE).

    Probes travel as ``str(v)`` and round-trip str → key type → string
    IN SPARK, so a type-coercible value (an int tombstone against a
    double key — JSON has no float/int distinction) coerces instead of
    failing strict createDataFrame verification; a value that does not
    cast at all disables pruning for this call (every live file kept —
    conservative; Spark hash functions do NOT null out on NULL input,
    so a hashed NULL would otherwise masquerade as a real key)."""
    key = _table_key_opt(table, version)
    ktype = None
    if key is not None:
        sch = current_schema(table, version)  # None on pre-tracking logs
        if sch is not None:
            ktype = next((f.dataType for f in sch.fields if f.name == key), None)
    # Driver-side probe (round 14): for int/long/string keys whose probe
    # values already carry the key's Python type, Python str() renders
    # EXACTLY what Spark's cast chain would (ints: identical digits;
    # strings: identity — the bool/float divergences the round-8 ADVICE
    # flagged cannot arise), so the bit-exact Python XXH64 twin computes
    # the masks with zero Spark jobs. Any type mismatch falls through to
    # the Spark-rendered probe below.
    if ktype is not None and ktype.typeName() in ("integer", "long", "string"):
        want_str = ktype.typeName() == "string"
        if all(
            (isinstance(v, str) if want_str else
             (isinstance(v, int) and not isinstance(v, bool)))
            for v in values
        ):
            masks = [
                _bloom_mask_py([v if want_str else str(v)]) for v in values
            ]
            out = []
            for a in live_files(table, version):
                if "bloom" not in a:
                    out.append(a)
                    continue
                fmask = int(a["bloom"], 16)
                if any((m & fmask) == m for m in masks):
                    out.append(a)
            return out
    probe_src = spark.createDataFrame([(str(v),) for v in values], "k string")
    if ktype is not None:
        # try_cast, not cast: under ANSI mode (this repo's default) a
        # plain cast of an uncastable probe THROWS instead of yielding
        # the NULL the conservative keep-all fallback below checks for
        probe_src = probe_src.select(
            F.col("k").try_cast(ktype).cast("string").alias("k")
        )
    # else: keyless or pre-schema-tracking tables wrote no typed blooms
    # worth matching — the raw str(v) rendering matches the legacy writer
    probe = probe_src.select(
        F.col("k"), _bloom_positions(F.col("k")).alias("ps")
    ).collect()
    if any(r["k"] is None for r in probe):
        return list(live_files(table, version))
    masks = []
    for r in probe:
        m = 0
        for p in r["ps"]:
            m |= 1 << int(p)
        masks.append(m)
    out = []
    for a in live_files(table, version):
        if "bloom" not in a:
            out.append(a)
            continue
        fmask = int(a["bloom"], 16)
        if any((m & fmask) == m for m in masks):
            out.append(a)
    return out


def _abs(table: str, name: str) -> str:
    return os.path.join(table, _DATA_DIR, name)


# ------------------------------------------------------------ operations


def current_schema(table: str, version: int | None = None):
    """The table's StructType as of ``version`` (default latest), read
    from the LOG, not from parquet footers — the Delta design: at 100 TB
    schema-on-read from footers is a full file-listing + footer sweep,
    and worse, footer union can't tell you WHICH schema a time-travel
    version had. Returns None for tables created before schema tracking
    (readers then fall back to footer inference)."""
    from pyspark.sql.types import StructType

    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"not a deltalite table: {table}")
    if version is None:
        version = vs[-1]
    schema = _state_at(table, version)["schema_json"]
    return StructType.fromJson(json.loads(schema)) if schema else None


def current_mapping(table: str, version: int | None = None) -> dict[str, str]:
    """Column mapping (logical name → physical parquet name) as of
    ``version`` — empty for tables that never renamed a column. The
    mapping is what lets RENAME/DROP COLUMN be metadata-only commits:
    immutable data files keep their creation-time (physical) column
    names forever; readers alias physical→logical and writers alias
    logical→physical at the two funnel boundaries."""
    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"not a deltalite table: {table}")
    if version is None:
        version = vs[-1]
    return dict(_state_at(table, version)["mapping"])


def _map_to_physical(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Alias a logical-named DataFrame to physical parquet names (the
    write boundary). Identity when the mapping is empty."""
    if not mapping:
        return df
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def _physical_schema(logical, mapping: dict[str, str]):
    """The parquet-side StructType for a logical log schema."""
    from pyspark.sql.types import StructField, StructType

    if logical is None or not mapping:
        return logical
    return StructType(
        [
            StructField(mapping.get(f.name, f.name), f.dataType, f.nullable)
            for f in logical.fields
        ]
    )


def _map_to_logical(df: DataFrame, logical, mapping: dict[str, str]) -> DataFrame:
    """Alias a physical-named scan back to the logical schema (the read
    boundary); also PROJECTS to the logical columns, which is what
    makes a dropped column disappear without touching its files."""
    if logical is None or not mapping:
        return df
    return df.select(
        *[
            F.col(mapping.get(f.name, f.name)).alias(f.name)
            for f in logical.fields
        ]
    )


class SchemaMismatch(Exception):
    """Append schema differs from the table schema and merge_schema is
    off, or the evolution is non-additive (drop / type change)."""


class ConstraintViolation(Exception):
    """Incoming rows violate a declared CHECK constraint."""


def current_constraints(table: str, version: int | None = None) -> dict[str, str]:
    """The table's CHECK constraints (name → boolean SQL expr) as of
    ``version`` — carried in log entries like the schema; the latest
    entry declaring ``constraints`` wins."""
    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"not a deltalite table: {table}")
    if version is None:
        version = vs[-1]
    return _state_at(table, version)["constraints"]


def _enforce_constraints(df: DataFrame, constraints: dict[str, str], ctx: str) -> None:
    """Reject the write if ANY incoming row fails a declared check —
    Delta's write-time enforcement: the guarantee that makes downstream
    readers trust the invariant WITHOUT re-validating 100 TB on every
    scan. One conditional aggregate over the batch computes every
    constraint's violation count in a single pass; the error carries
    per-constraint counts (churn-scale job, no sample collection of
    unbounded size)."""
    if not constraints:
        return
    counts = df.agg(
        *[
            F.sum(F.when(~F.expr(expr), 1).otherwise(0)).alias(name)
            for name, expr in constraints.items()
        ]
    ).collect()[0]
    bad = {n: int(counts[n] or 0) for n in constraints if (counts[n] or 0) > 0}
    if bad:
        raise ConstraintViolation(
            f"{ctx}: rows violate CHECK constraints "
            + ", ".join(f"{n} ({constraints[n]!r}): {c} rows" for n, c in bad.items())
        )


# Merge-on-read deletes: tombstones are a metadata-only commit; reads
# anti-filter them until a materialization rewrites the touched files.
TOMBSTONE_MAX = 100_000


def pending_tombstones(table: str, version: int | None = None) -> list:
    """Key tombstones not yet materialized as of ``version``: replay
    accumulates DELETE DEFERRED commits and clears on any commit flagged
    ``tombstones_cleared`` (the materialization)."""
    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"not a deltalite table: {table}")
    if version is None:
        version = vs[-1]
    return _state_at(table, version)["tombstones"]


def delete_keys_deferred(spark: SparkSession, table: str, keys: list) -> int:
    """DELETE as MERGE-ON-READ: an O(1) metadata commit recording key
    TOMBSTONES instead of rewriting data files — the Delta deletion-
    vector idea at key granularity. Reads anti-filter tombstoned keys;
    ``materialize_tombstones`` (or OPTIMIZE) pays the rewrite later,
    off the latency path. This is the 100 TB erasure-request shape:
    acknowledge the delete in milliseconds, batch the rewrites.

    The table stays SINGLE-WRITER simple: appends and merges refuse
    while tombstones are pending (a key-level tombstone cannot tell a
    pre-delete row from a legitimately re-inserted one), so
    materialize first. Tombstone volume is capped at TOMBSTONE_MAX —
    beyond that the rewrite is cheaper than the read-side filter.
    """
    prior = versions(table)
    if not prior:
        raise ValueError(f"table {table} does not exist")
    key = _table_key_opt(table)
    if key is None:
        raise ValueError("deferred deletes require a table key")
    pend = pending_tombstones(table)
    if len(pend) + len(keys) > TOMBSTONE_MAX:
        raise ValueError(
            f"tombstone count would exceed {TOMBSTONE_MAX}; materialize first"
        )
    # Reject keys the key column cannot represent BEFORE they enter the
    # log: a tombstone like 'banana' on a bigint key can never match a
    # row, and under ANSI mode the read-side anti-filter `key IN (...)`
    # would THROW on it — one junk tombstone wedging every reader of
    # the table. try_cast (not cast): ANSI cast raises instead of
    # yielding the NULL this check looks for.
    sch = current_schema(table)
    ktype = None
    if sch is not None:
        ktype = next((f.dataType for f in sch.fields if f.name == key), None)
    if ktype is not None and keys:
        probe = spark.createDataFrame([(str(k),) for k in keys], "k string")
        bad = probe.where(
            F.col("k").try_cast(ktype).isNull() & F.col("k").isNotNull()
        ).collect()
        if bad:
            raise ValueError(
                f"tombstone key(s) not castable to {key}'s type "
                f"{ktype.simpleString()}: {[r['k'] for r in bad][:5]}"
            )
    v = prior[-1] + 1
    _commit_exclusive(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": "DELETE DEFERRED",
            "key": key,
            "tombstones": list(keys),
            "add": [],
            "remove": [],
        },
    )
    return v


def materialize_tombstones(spark: SparkSession, table: str) -> int:
    """Apply pending tombstones to the data files (rewrite only files
    containing tombstoned keys — delete_where's file discovery) and
    clear the tombstone list in the same commit."""
    pend = pending_tombstones(table)
    if not pend:
        return versions(table)[-1]
    # Full log scan-back, never a last-entry peek with an "id" guess: a
    # metadata-only commit (constraint, PUBLISH) landing after the
    # DELETE DEFERRED would otherwise make this destructive rewrite
    # delete by the wrong column. Tombstones pending implies
    # delete_keys_deferred found a key, so _table_key cannot miss.
    key = _table_key(table)
    vals = ", ".join(_sql_literal(k) for k in pend)
    return delete_where(
        spark,
        table,
        f"{key} in ({vals})",
        _clear_tombstones=True,
        # bounds the discovery scan via blooms + key stats: O(candidate
        # files), not O(table) — the erasure-request batch shape
        _candidate_keys=list(pend),
    )


def add_constraint(spark: SparkSession, table: str, name: str, expr: str) -> int:
    """ALTER TABLE ADD CONSTRAINT name CHECK (expr): existing data is
    validated FIRST (Delta semantics — a constraint you can add to dirty
    data is a lie), then a metadata-only commit records the new
    constraint set."""
    cons = current_constraints(table)
    if name in cons:
        raise ValueError(f"constraint {name!r} already exists")
    _enforce_constraints(read(spark, table), {name: expr}, "existing data")
    cons[name] = expr
    v = versions(table)[-1] + 1
    _commit_exclusive(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": "ADD CONSTRAINT",
            "constraints": cons,
            "add": [],
            "remove": [],
        },
    )
    return v


def _protected_columns(table: str) -> dict[str, str]:
    """Columns the engine itself addresses BY NAME inside the log
    (footer stats keys, partition index, zorder spec, CHECK exprs, CDC
    tombstone flag) → reason. Renaming one would desynchronize logged
    metadata from file contents, so rename/drop reject them — Delta
    takes the same posture for partition/bloom columns."""
    import re as _re

    out: dict[str, str] = {}
    k = _table_key_opt(table)
    if k is not None:
        out[k] = "table key (footer stats + blooms are logged under it)"
    p = _table_partition_by(table)
    if p is not None:
        out[p] = "partition column (the logged partition index)"
    for z in _table_zorder_by(table):
        out.setdefault(z, "zorder column (logged clustering spec)")
    # Tokenizing a CHECK expr with a bare-identifier regex would also
    # capture SQL keywords and the CONTENTS of string literals (e.g.
    # "seg = 'north'" must not protect a column named north), spuriously
    # blocking rename/drop of unrelated columns (round-8 review). Strip
    # quoted literals first, then keep only tokens that name an actual
    # logical column of the table.
    sch = current_schema(table)
    logical = (
        {f.name for f in sch.fields} if sch is not None else None
    )
    for name, expr in current_constraints(table).items():
        # both literal syntaxes: single-quoted (ANSI) AND double-quoted
        # (Spark SQL's default when double-quoted identifiers are off —
        # round-9 review: 'seg = "north"' must not protect a column
        # named north any more than the single-quoted spelling does).
        # Literals consume doubled-quote ('') AND backslash escapes
        # (round-10: in "note = 'don\\'t' OR amount > 0" the \' must
        # not close the literal, or the boundary shifts and real column
        # tokens after it get stripped as literal text).
        bare = _re.sub(
            r"'(?:[^'\\]|\\.|'')*'|\"(?:[^\"\\]|\\.|\"\")*\"", " ", expr
        )
        for tok in set(_re.findall(r"[A-Za-z_][A-Za-z0-9_]*", bare)):
            if logical is not None and tok not in logical:
                continue
            out.setdefault(tok, f"referenced by CHECK constraint {name!r}")
    out.setdefault(
        "__cdc_deleted", "CDC tombstone flag (apply_changes contract)"
    )
    return out


def _check_new_logical_name(st: dict, new: str, own_physical: str | None = None) -> None:
    """A new logical name may not collide with a live logical column,
    any column's PHYSICAL name, or a retired physical name — data files
    are immutable, so a physical collision would silently splice old
    file data into the new column. ``own_physical`` exempts the renamed
    column's own physical slot (renaming BACK to it just collapses the
    mapping)."""
    logical = (
        {f["name"] for f in json.loads(st["schema_json"])["fields"]}
        if st["schema_json"]
        else set()
    )
    physical = {st["mapping"].get(n, n) for n in logical} | set(st["retired"])
    physical.discard(own_physical)
    if new in logical:
        raise ValueError(f"column {new!r} already exists")
    if new in physical:
        raise ValueError(
            f"name {new!r} collides with a physical column name still "
            "present in immutable data files (renamed-away or dropped); "
            "choose another name"
        )


def rename_column(table: str, old: str, new: str) -> int:
    """ALTER TABLE RENAME COLUMN — a METADATA-ONLY commit (no data
    rewrite, Delta/Iceberg column-mapping semantics): the logical
    schema renames the field and the mapping records logical→physical,
    while every immutable data file keeps its creation-time column
    name. Readers alias physical→logical; writers alias back. Time
    travel to a pre-rename version sees the old name (the fold is
    versioned). Engine-addressed columns (key / partition / zorder /
    constraint-referenced / CDC flag) are rejected with the reason."""
    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"not a deltalite table: {table}")
    st = _state_at(table, vs[-1])
    if not st["schema_json"]:
        raise ValueError(
            f"table {table} predates schema tracking; rename needs a "
            "logged schema"
        )
    sch = json.loads(st["schema_json"])
    names = [f["name"] for f in sch["fields"]]
    if old not in names:
        raise ValueError(f"no such column: {old!r} (have {names})")
    prot = _protected_columns(table)
    if old in prot:
        raise ValueError(f"cannot rename {old!r}: {prot[old]}")
    _check_new_logical_name(st, new, own_physical=st["mapping"].get(old, old))
    mapping = dict(st["mapping"])
    mapping[new] = mapping.pop(old, old)  # physical name is sticky
    if mapping[new] == new:
        del mapping[new]  # renamed back to its physical name
    for f in sch["fields"]:
        if f["name"] == old:
            f["name"] = new
    v = vs[-1] + 1
    _commit_exclusive(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": f"RENAME COLUMN ({old} -> {new})",
            "schema_json": json.dumps(sch),
            "column_mapping": mapping,
            "retired_physical": list(st["retired"]),
            "add": [],
            "remove": [],
        },
    )
    return v


def drop_column(table: str, col: str) -> int:
    """ALTER TABLE DROP COLUMN — metadata-only (no data rewrite): the
    logical schema loses the field, readers project it away, and its
    PHYSICAL name is retired forever (immutable files still contain the
    bytes, so re-adding the name would resurrect stale data — the
    collision guard makes that impossible). Protected columns reject as
    in rename_column."""
    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"not a deltalite table: {table}")
    st = _state_at(table, vs[-1])
    if not st["schema_json"]:
        raise ValueError(
            f"table {table} predates schema tracking; drop needs a "
            "logged schema"
        )
    sch = json.loads(st["schema_json"])
    names = [f["name"] for f in sch["fields"]]
    if col not in names:
        raise ValueError(f"no such column: {col!r} (have {names})")
    if len(names) == 1:
        raise ValueError("cannot drop the only column")
    prot = _protected_columns(table)
    if col in prot:
        raise ValueError(f"cannot drop {col!r}: {prot[col]}")
    mapping = dict(st["mapping"])
    physical = mapping.pop(col, col)
    retired = list(st["retired"])
    if physical not in retired:
        retired.append(physical)
    sch["fields"] = [f for f in sch["fields"] if f["name"] != col]
    v = vs[-1] + 1
    _commit_exclusive(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": f"DROP COLUMN ({col})",
            "schema_json": json.dumps(sch),
            "column_mapping": mapping,
            "retired_physical": retired,
            "add": [],
            "remove": [],
        },
    )
    return v


def drop_constraint(table: str, name: str) -> int:
    """ALTER TABLE DROP CONSTRAINT — metadata-only commit."""
    cons = current_constraints(table)
    if name not in cons:
        raise ValueError(f"no such constraint: {name!r}")
    del cons[name]
    v = versions(table)[-1] + 1
    _commit_exclusive(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": "DROP CONSTRAINT",
            "constraints": cons,
            "add": [],
            "remove": [],
        },
    )
    return v


# Safe implicit widenings for appends (source type → acceptable wider
# table types). The FILE is cast to the table type before staging, so
# every data file carries the table's physical type and the log-schema
# read never hits a parquet type-conversion error.
_SAFE_WIDEN = {
    "byte": {"short", "integer", "long"},
    "short": {"integer", "long"},
    "integer": {"long"},
    "float": {"double"},
}


def _evolve_schema(table: str, df: DataFrame, merge_schema: bool):
    """Validate df's schema against the table's logged schema. Returns
    ``(df_cast, schema_to_record)``: df with upcast-compatible columns
    cast to the table's (wider) types, and the possibly-widened table
    schema. Additive evolution ONLY — new nullable columns appended;
    dropping a column or a non-widening type change is rejected even
    under merge_schema (Delta's posture: widening is safe for every
    reader, narrowing silently breaks them).
    """
    from pyspark.sql.types import StructType

    cur = current_schema(table)
    if cur is None:
        return df, df.schema
    from pyspark.sql.types import DecimalType

    cur_fields = {f.name: f.dataType for f in cur.fields}
    new_fields = {f.name: f.dataType for f in df.schema.fields}
    bad, widen = [], []
    for n, t in new_fields.items():
        if n in cur_fields and cur_fields[n] != t:
            cur_t = cur_fields[n]
            if cur_t.typeName() in _SAFE_WIDEN.get(t.typeName(), set()):
                widen.append(n)  # e.g. int literal into a bigint column
            elif (
                isinstance(cur_t, DecimalType)
                and isinstance(t, DecimalType)
                and cur_t.scale >= t.scale
                and cur_t.precision - cur_t.scale >= t.precision - t.scale
            ):
                # lossless decimal widening: the table's type holds every
                # value of the source's (scale and integer digits both ≥)
                widen.append(n)
            else:
                bad.append(n)
    dropped = [n for n in cur_fields if n not in new_fields]
    added = [n for n in new_fields if n not in cur_fields]
    if bad:
        raise SchemaMismatch(f"non-widening column type changes: {bad}")
    if added:
        # column-mapping collision guard: an evolved column may not
        # reuse a physical name still present in immutable data files
        # (old bytes would resurrect into the new column)
        st = _state_at(table, versions(table)[-1])
        reserved = set(st["mapping"].values()) | set(st["retired"])
        hit = [n for n in added if n in reserved]
        if hit:
            raise SchemaMismatch(
                f"new column(s) {hit} collide with physical names of "
                "renamed-away or dropped columns; choose other names"
            )
    if not merge_schema and (added or dropped):
        raise SchemaMismatch(
            f"append schema differs from table schema (added={added}, "
            f"missing={dropped}); pass merge_schema=True for additive evolution"
        )
    for n in widen:
        df = df.withColumn(n, F.col(n).cast(cur_fields[n]))
    out = StructType([f for f in cur.fields])
    for f in df.schema.fields:
        if f.name not in cur_fields:
            out.add(f.name, f.dataType, nullable=True)
    return df, out


def _apply_partitioning(df: DataFrame, partition_by: str | None) -> DataFrame:
    """Cluster rows so every ``partition_by`` value lands in exactly ONE
    staged file (hash repartition on the column: a value maps to one
    partition; a file may hold several values, but none is split), then
    sort within files so footer min/max stats stay tight. This is the
    log-tracked analogue of hive-style ``PARTITIONED BY`` — the
    per-file col_stats in the commit entry are the partition index, and
    ``read_pruned``/``files_overlapping`` are the planner that consumes
    it. At 100 TB, partition pruning on the ingestion-date column is
    the single highest-leverage skipping mechanism a lakehouse has.

    The partition count is EXPLICIT (one distinct-count job — metadata-
    scale for any sane partition column, same deliberate-extra-action
    precedent as the cosine guard): an implicit ``repartition(col)``
    gets AQE-coalesced into one file at small sizes, silently erasing
    the layout the caller asked for. Range partitioning (not hash)
    keeps per-file min/max tight AND contiguous."""
    if partition_by is None:
        return df
    n = max(df.select(partition_by).distinct().count(), 1)
    return df.repartitionByRange(n, F.col(partition_by)).sortWithinPartitions(
        partition_by
    )


def create_or_replace(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    key: str | None = None,
    partition_by: str | None = None,
    local_rows: list | None = None,
) -> int:
    """CREATE OR REPLACE TABLE AS SELECT: new version whose live set is
    exactly df's files; prior files stay on disk for time travel.
    ``partition_by`` declares a clustering column: values never span
    files and per-file min/max stats for the column land in the log.

    ``local_rows`` (round 15): df's OWN rows when the caller already
    holds them driver-side (positional tuples/Rows in df.schema order —
    the streaming gates' metadata-scale state seeds). The staged file
    is then written directly with pyarrow and its stats/bloom computed
    by the Python twins: ZERO Spark jobs, including the partitioned
    case, whose _apply_partitioning would otherwise pay a
    distinct-count job + a range-sample job + the write job
    (VERDICT r14 #1/#4). Above the dial, or for schemas without an
    exact pyarrow twin, the distributed writer runs as before."""
    prior = versions(table)
    removed = [a["file"] for a in live_files(table)] if prior else []
    stats_cols = [partition_by] if partition_by else None
    use_local = (
        local_rows is not None
        and len(local_rows) <= STAGE_DRIVER_MAX_ROWS
        and _stage_local_ok(
            df.schema, key, _effective_stats_cols(table, df.columns, stats_cols)
        )
    )
    if use_local:
        adds = _stage_rows_local(
            table,
            local_rows,
            df.schema,
            key,
            stats_cols=stats_cols,
            mapping={},  # a REPLACE starts a fresh identity mapping
            partition_by=partition_by,
        )
    else:
        adds = _stage_files(
            _apply_partitioning(df, partition_by),
            table,
            key,
            stats_cols=stats_cols,
            mapping={},  # a REPLACE starts a fresh identity mapping
        )
    v = (prior[-1] + 1) if prior else 0
    _commit_exclusive(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": "CREATE OR REPLACE" if prior else "CREATE",
            "key": key,
            "partition_by": partition_by,
            # REPLACE resets table metadata (Delta semantics): declared
            # constraints do not survive a full re-creation
            "constraints": {},
            "schema_json": df.schema.json(),
            "add": adds,
            "remove": removed,
        },
    )
    return v


def append(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    key: str | None = None,
    partition_by: str | None = None,
    merge_schema: bool = False,
    local_rows: list | None = None,
) -> int:
    """Blind append: add-only commit, no files rewritten. A schema that
    differs from the table's logged schema raises SchemaMismatch unless
    ``merge_schema=True``, which permits ADDITIVE evolution (new
    nullable columns; old files null-fill on read via the log schema).
    ``local_rows``: driver-resident rows of df for zero-job staging
    (see create_or_replace)."""
    prior = versions(table)
    if not prior:
        return create_or_replace(
            spark, table, df, key, partition_by=partition_by,
            local_rows=local_rows,
        )
    if partition_by is None:
        # inherit the table's declared clustering: an append that forgot
        # the partition column would otherwise write files spanning every
        # partition value, quietly breaking pruning for all new data
        partition_by = _table_partition_by(table)
    if key is None:
        # inherit the declared key the same way: a key-less append would
        # write files with no min/max key stats and no bloom, turning
        # them into permanent MERGE candidates (round-7 review)
        key = _table_key_opt(table)
    df, schema = _evolve_schema(table, df, merge_schema)
    if pending_tombstones(table):
        raise ValueError(
            "table has pending deferred deletes; run materialize_tombstones "
            "first (a key tombstone cannot distinguish a pre-delete row from "
            "a re-inserted one)"
        )
    _enforce_constraints(df, current_constraints(table), "APPEND")
    stats_cols = [partition_by] if partition_by else None
    # driver-resident fast path (see create_or_replace): zero-job
    # staging for the sketch-stream state commits. Schema evolution
    # invalidates the caller's rows (widening casts), so only an
    # unevolved append takes it.
    use_local = (
        local_rows is not None
        and len(local_rows) <= STAGE_DRIVER_MAX_ROWS
        and [(f.name, f.dataType) for f in df.schema.fields]
        == [(f.name, f.dataType) for f in schema.fields]
        and _stage_local_ok(
            df.schema, key, _effective_stats_cols(table, df.columns, stats_cols)
        )
    )
    if use_local:
        adds = _stage_rows_local(
            table,
            local_rows,
            df.schema,
            key,
            stats_cols=stats_cols,
            partition_by=partition_by,
        )
    else:
        adds = _stage_files(
            _apply_partitioning(df, partition_by),
            table,
            key,
            stats_cols=stats_cols,
        )
    v = prior[-1] + 1
    # add-only: a lost commit race against another add-only writer
    # rebases onto the new HEAD instead of failing (classified retry)
    return _commit_rebase(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": "APPEND",
            "key": key,
            "partition_by": partition_by,
            "schema_json": schema.json(),
            "add": adds,
            "remove": [],
        },
    )


def snapshot_versions(tables, max_attempts: int = 25) -> dict:
    """A CONSISTENT cross-table version cut (the multi-table snapshot
    Delta lacks and Iceberg needs a Nessie-style catalog for): pin one
    version per table such that all pinned versions coexisted as the
    tables' HEADs at a single instant — a downstream reader joining
    silver tables through these pins can never see table A post-commit
    and table B pre-commit of the same pipeline run.

    Seqlock capture: sweep every HEAD, sweep again; versions only grow,
    so if the two sweeps agree then no table committed between them and
    the whole map was simultaneously HEAD at the instant between the
    sweeps. Retries under write pressure, raises after
    ``max_attempts`` racing sweeps rather than returning a torn cut.
    Pure metadata (two listdir sweeps per attempt); feed the pins to
    :func:`read` / :func:`read_snapshot` for time-travel reads."""
    tables = list(tables)

    def head(t: str) -> int:
        vs = versions(t)
        if not vs:
            raise FileNotFoundError(f"not a deltalite table: {t}")
        return vs[-1]

    for _ in range(max_attempts):
        first = {t: head(t) for t in tables}
        second = {t: head(t) for t in tables}
        if first == second:
            return first
    raise RuntimeError(
        f"no stable version cut across {len(tables)} tables after "
        f"{max_attempts} attempts (sustained concurrent commits)"
    )


def read_snapshot(
    spark: SparkSession, pins: dict, table: str
) -> DataFrame:
    """Read ``table`` at its pinned version from a
    :func:`snapshot_versions` cut."""
    if table not in pins:
        raise KeyError(f"{table} not in snapshot pins {sorted(pins)}")
    return read(spark, table, version=pins[table])


def read(spark: SparkSession, table: str, version: int | None = None) -> DataFrame:
    """Snapshot read (time travel via ``version``). The schema comes
    from the LOG as of that version (null-filling files written before
    an additive evolution; a time-travel read of a pre-evolution
    version sees the OLD schema) — footer inference is the fallback for
    pre-schema-tracking tables."""
    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"not a deltalite table: {table}")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise ValueError(f"version {version} not in {vs}")
    # ONE fold for every view this read needs — live set, schema,
    # tombstones, key. The per-view helpers each replay independently
    # (checkpoint parse + tail fold), which multiplies metadata I/O
    # 4x per read on exactly the tables checkpoints exist for.
    st = _state_at(table, version)
    files = list(st["live"].values())
    if not files:
        raise ValueError(f"table {table} has no live files at version {version}")
    reader = spark.read
    logical = None
    if st["schema_json"]:
        logical = StructType.fromJson(json.loads(st["schema_json"]))
        # files carry PHYSICAL names; the scan schema must match them,
        # then the projection aliases back to the logical schema (and
        # drops retired columns)
        reader = reader.schema(_physical_schema(logical, st["mapping"]))
    df = reader.parquet(*[_abs(table, a["file"]) for a in files])
    df = _map_to_logical(df, logical, st["mapping"])
    pend = st["tombstones"]
    if pend:
        # merge-on-read: un-materialized deletes filter at scan time.
        # NULL-key rows pass: NOT(NULL IN (...)) is NULL under
        # three-valued logic and where() would silently drop them
        if st["key"] is None:
            raise ValueError(f"table {table} has no declared key")
        k = F.col(st["key"])
        df = df.where(k.isNull() | ~k.isin(pend))
    return df


def table_row_count(table: str, version: int | None = None) -> int:
    """COUNT(*) from METADATA: the log's per-file row counts summed over
    the live set — O(files-in-log) with zero data IO, the Delta
    numRecords trick. At 100 TB this is the difference between an
    instant answer and a full scan. NOTE: pending merge-on-read
    tombstones are not reflected (they hide rows at scan time);
    callers needing exactness under pending tombstones should
    materialize first — the returned count is the PHYSICAL row count."""
    return sum(a["rows"] for a in live_files(table, version))


# Write-audit-publish (WAP): stage → validate → publish/discard. The
# Iceberg audit-branch workflow on the commit log — a staged commit's
# files are on disk and log-recorded but INVISIBLE to every reader
# until a PUBLISH entry names it, so validation runs on exactly the
# bytes that will go live and the flip is atomic metadata.


def append_staged(
    spark: SparkSession, table: str, df: DataFrame, key: str | None = None
) -> int:
    """Stage an append: files written + committed with ``staged`` set;
    readers skip it until publish(). Declared CHECK constraints still
    enforce at stage time (they are table invariants, not audit
    opinions); schema must match exactly (no evolution through the
    staging path)."""
    prior = versions(table)
    if not prior:
        raise ValueError(f"table {table} does not exist (create before staging)")
    if pending_tombstones(table):
        raise ValueError("materialize deferred deletes before staging")
    df, _schema = _evolve_schema(table, df, merge_schema=False)
    _enforce_constraints(df, current_constraints(table), "APPEND STAGED")
    adds = _stage_files(df, table, key)
    v = prior[-1] + 1
    # staged adds are invisible until PUBLISH, so the same add-only
    # rebase applies
    return _commit_rebase(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": "APPEND STAGED",
            "staged": True,
            "key": key,
            "add": adds,
            "remove": [],
        },
    )


def read_staged(spark: SparkSession, table: str, staged_version: int) -> DataFrame:
    """The staged commit's OWN rows (what an audit validates)."""
    adds = _unresolved_staged(table).get(staged_version)
    if adds is None:
        raise ValueError(f"version {staged_version} is not an unresolved staged commit")
    if not adds:
        raise ValueError(f"staged commit {staged_version} has no files")
    df = spark.read.parquet(*[_abs(table, a["file"]) for a in adds])
    # staged files carry physical names; the auditor sees logical ones
    for lg, ph in current_mapping(table).items():
        df = df.withColumnRenamed(ph, lg)
    return df


def _resolve_staged(table: str, staged_version: int, op: str, field: str) -> int:
    if staged_version not in _unresolved_staged(table):
        raise ValueError(
            f"version {staged_version} is not an unresolved staged commit"
        )
    v = versions(table)[-1] + 1
    _commit_exclusive(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": op,
            field: staged_version,
            "add": [],
            "remove": [],
        },
    )
    return v


def publish(table: str, staged_version: int) -> int:
    """Atomically flip a staged commit live (metadata-only)."""
    return _resolve_staged(table, staged_version, "PUBLISH", "publishes")


def discard_staged(table: str, staged_version: int) -> int:
    """Reject a staged commit: its rows never become visible; its files
    become vacuumable orphans."""
    return _resolve_staged(table, staged_version, "DISCARD", "discards")


def audited_append(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    key: str | None,
    audit_fn,
) -> tuple[int, bool]:
    """The WAP loop in one call: stage, run ``audit_fn(staged_rows) ->
    bool`` on exactly the bytes that would go live, then publish (True)
    or discard (False). Readers see either the old table or the fully
    validated new state — never a half-audited batch. This is the
    write-side home of the DQ engine: quality/checks.py validates the
    batch, and a failure costs a discarded commit, not a dirty table.
    """
    sv = append_staged(spark, table, df, key)
    ok = bool(audit_fn(read_staged(spark, table, sv)))
    if ok:
        publish(table, sv)
    else:
        discard_staged(table, sv)
    return versions(table)[-1], ok


def read_keys(
    spark: SparkSession, table: str, keys: list, version: int | None = None
) -> DataFrame:
    """POINT-LOOKUP read: only the live files whose key stats AND bloom
    admit at least one of ``keys`` (files_maybe_containing — sound,
    never drops a holder), read under the full read() contract and
    filtered to exactly those keys. ``keys`` must be metadata-scale
    (the probe mask check is O(files × keys) driver-side); callers with
    data-scale key sets should join against read() instead."""
    files = files_maybe_containing(spark, table, list(keys), version)
    if not files:
        schema = current_schema(table, version)
        if schema is not None:
            return spark.createDataFrame([], schema)
        return read(spark, table, version).where(F.lit(False))
    k = F.col(_table_key(table, version))
    return _read_files(spark, table, files, version).where(k.isin(list(keys)))


def read_keys_local(
    spark: SparkSession, table: str, keys: list, columns: list[str]
) -> list[dict] | None:
    """Driver-side twin of :func:`read_keys` for churn-scale lookups:
    prune files by key stats + bloom (files_maybe_containing), then read
    the requested columns locally via pyarrow and filter to the key set
    — zero Spark jobs. Returns None whenever the full read() contract is
    actually needed, and the caller must fall back to the distributed
    read: pending tombstones (the anti-filter must apply), a
    non-identity column mapping, any pruned file above the driver dials,
    or a pre-evolution file missing a requested column. Sound because
    files_maybe_containing never drops a key holder and the gates refuse
    every table state where a raw file read could differ from read()."""
    if pending_tombstones(table):
        return None
    if current_mapping(table):
        return None
    # key-type gate (round-14 review): pyarrow-decoded values must
    # compare EQUAL to Spark-collected ones, which is only trivially
    # true for int/long/string — a timestamp key (pyarrow UTC datetimes
    # vs Spark session-local naive) would silently match nothing and
    # report every key as absent instead of falling back
    kcol = _table_key(table)
    sch = current_schema(table)
    ktype = (
        next((f.dataType.typeName() for f in sch.fields if f.name == kcol), None)
        if sch is not None
        else None
    )
    if ktype not in ("integer", "long", "string"):
        return None
    files = files_maybe_containing(spark, table, list(keys))
    if len(files) > MERGE_DRIVER_DISCOVERY_MAX_FILES:
        return None
    # rows is optional in legacy log entries — missing means unknown
    # size, which must mean fallback, never KeyError
    if any("rows" not in a or a["rows"] > BLOOM_DRIVER_MAX_ROWS for a in files):
        return None
    if kcol not in columns:
        columns = [kcol] + list(columns)
    keyset = set(keys)
    out: list[dict] = []
    for a in files:
        try:
            tbl = pq.read_table(_abs(table, a["file"]), columns=list(columns))
        except Exception:
            return None  # pre-evolution file lacking a column, etc.
        cols = {c: tbl.column(c).to_pylist() for c in columns}
        for i in range(tbl.num_rows):
            if cols[kcol][i] in keyset:
                out.append({c: cols[c][i] for c in columns})
    return out


def distinct_values_local(table: str, col: str) -> set | None:
    """Driver-side distinct values of one column across a table's live
    files via pyarrow — zero Spark jobs — for METADATA-SCALE state
    tables (streaming sketch/replay-guard tables: a few small files).
    Returns None whenever the full read() contract is needed and the
    caller must fall back to a distributed read: pending tombstones, a
    non-identity column mapping, too many / too large / unsized files,
    or a file missing the column (pre-evolution). Round 14: the
    streaming sketch ingests burned one read+anti-join Spark job per
    micro-batch just to test replay of an integer batch tag."""
    if pending_tombstones(table):
        return None
    if current_mapping(table):
        return None
    files = live_files(table)
    if len(files) > MERGE_DRIVER_DISCOVERY_MAX_FILES:
        return None
    if any("rows" not in a or a["rows"] > BLOOM_DRIVER_MAX_ROWS for a in files):
        return None
    out: set = set()
    for a in files:
        try:
            out.update(
                pq.read_table(_abs(table, a["file"]), columns=[col])
                .column(0)
                .to_pylist()
            )
        except Exception:
            return None
    return out


def read_pruned_multi(
    spark: SparkSession,
    table: str,
    bounds: dict,
    version: int | None = None,
) -> DataFrame:
    """Conjunctive multi-column range scan with file skipping: keep only
    live files whose logged min/max intersects EVERY ``col: (lo, hi)``
    bound, then apply all residual filters. This is the reader that
    pays off OPTIMIZE ZORDER: a z-clustered layout keeps per-file
    ranges tight on every z dimension AT ONCE, so a 2-D point/range
    query intersects far fewer files than either 1-D clustering would
    allow. Sound: a file missing stats for a bounded column is read.

    The pruned read honors the SAME read contract as ``read()`` —
    log-derived schema (null-filling pre-evolution files, never an
    arbitrary footer) and the pending-tombstone anti-filter (a skipped
    rewrite must not resurrect logically deleted rows) — pruning only
    ever cuts the FILE list, never changes the visible rows/columns."""
    files = pruned_files(table, bounds, version)
    if not files:
        return read(spark, table, version).where(F.lit(False))
    df = _read_files(spark, table, files, version)
    for col, (lo, hi) in bounds.items():
        df = df.where((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
    return df


def pruned_files(table: str, bounds: dict, version: int | None = None) -> list[dict]:
    """The live files a conjunctive multi-column range scan must read:
    keep a file iff its logged min/max intersects EVERY ``col: (lo,
    hi)`` bound (a file missing stats for a bounded column is kept —
    skipping stays sound). The n-D sibling of ``files_overlapping``,
    shared by ``read_pruned_multi`` and skip-proof consumers so the
    guard and the actual read can never drift."""
    files = []
    for a in live_files(table, version):
        keep = True
        for col, (lo, hi) in bounds.items():
            cs = a.get("col_stats", {}).get(col)
            if cs is not None and _stats_disjoint(cs[0], cs[1], lo, hi):
                keep = False
                break
        if keep:
            files.append(a)
    return files


def _read_files(
    spark: SparkSession,
    table: str,
    files: list[dict],
    version: int | None,
    with_tombstones: bool = True,
) -> DataFrame:
    """Read a file SUBSET under the full read() contract: log schema as
    of ``version`` (so schema-evolved columns null-fill instead of
    silently vanishing when the subset happens to contain only
    pre-evolution files — or, worse, when a REWRITE path takes one
    file's footer as the schema and permanently drops the evolved
    column from the files it writes) and, by default, the merge-on-read
    tombstone anti-filter (so a pruned scan cannot resurrect
    deferred-deleted rows). Rewrite paths pass
    ``with_tombstones=False``: a physical rewrite must see the raw file
    contents — ``materialize_tombstones`` in particular relies on the
    tagged scan FINDING the tombstoned rows it is about to drop."""
    # ONE fold for schema + mapping + tombstones + key (same
    # fold-once rule read() follows)
    vs = versions(table)
    st = _state_at(table, vs[-1] if version is None else version)
    schema = (
        StructType.fromJson(json.loads(st["schema_json"]))
        if st["schema_json"]
        else None
    )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(_physical_schema(schema, st["mapping"]))
    df = reader.parquet(*[_abs(table, a["file"]) for a in files])
    df = _map_to_logical(df, schema, st["mapping"])
    if with_tombstones:
        pend = st["tombstones"]
        if pend:
            if st["key"] is None:
                raise ValueError(f"table {table} has no declared key")
            # same NULL-key pass-through as read() (three-valued logic)
            k = F.col(st["key"])
            df = df.where(k.isNull() | ~k.isin(pend))
    return df


def version_at_timestamp(table: str, ts: float) -> int:
    """TIMESTAMP AS OF resolution: the latest version committed at or
    before ``ts`` (unix seconds) — Delta's timestamp time travel. Raises
    if the table's first commit is later than ``ts``."""
    vs = versions(table)
    if not vs:
        raise FileNotFoundError(f"not a deltalite table: {table}")
    best = None
    for v in vs:
        if _read_entry(table, v)["timestamp"] <= ts:
            best = v
        else:
            break
    if best is None:
        raise ValueError(
            f"no version of {table} exists at or before timestamp {ts}"
        )
    return best


def read_as_of(spark: SparkSession, table: str, ts: float) -> DataFrame:
    """Snapshot read at a wall-clock instant (TIMESTAMP AS OF)."""
    return read(spark, table, version_at_timestamp(table, ts))


def _table_key(table: str, version: int | None = None) -> str:
    """The table's declared key column as of ``version`` (latest commit
    that recorded one)."""
    vs = versions(table)
    if version is None:
        version = vs[-1]
    key = _state_at(table, version)["key"]
    if key is None:
        raise ValueError(f"table {table} has no declared key")
    return key


def _table_partition_by(table: str, version: int | None = None) -> str | None:
    """The table's DECLARED partition column as of ``version``: the
    ``partition_by`` recorded by the most recent CREATE / CREATE OR
    REPLACE commit (appends record their per-write clustering, which
    may legitimately be None — the declaration lives on the create).
    None when the table was created unpartitioned or predates the
    tracking."""
    vs = versions(table)
    if not vs:
        return None
    if version is None:
        version = vs[-1]
    return _state_at(table, version)["partition_by"]


def _table_zorder_by(table: str, version: int | None = None) -> list:
    """The zorder columns of the most recent OPTIMIZE ZORDER commit (as
    of ``version``), or []. Rewrite paths carry these columns' stats
    forward on the files they write: min/max stats stay SOUND on any
    layout (ranges merely widen as clustering decays), and without the
    carry-forward every MERGE/DELETE rewrite would turn a z-skippable
    file into an always-read one."""
    vs = versions(table)
    if not vs:
        return []
    if version is None:
        version = vs[-1]
    return _state_at(table, version)["zorder_by"]


def _table_key_opt(table: str, version: int | None = None) -> str | None:
    """``_table_key`` without the raise: None when no commit up to
    ``version`` ever declared a key. Metadata-only commits (PUBLISH,
    DISCARD, ADD/DROP CONSTRAINT, DELETE DEFERRED materializations)
    legitimately omit "key", so any consumer that looked only at the
    LAST entry would intermittently see None — every key lookup must
    scan back through the log (round-7 advisory fix)."""
    try:
        return _table_key(table, version)
    except ValueError:
        return None


def read_pruned(
    spark: SparkSession,
    table: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Range scan with file skipping: read ONLY the live files whose
    logged ``col`` min/max intersects [lo, hi], then apply the residual
    filter (skipping is sound — a file without stats is always read —
    so the residual keeps the result exact). On a ``partition_by=col``
    table this is partition pruning: the planner-side file-list cut
    that no Catalyst filter pushdown can achieve once all files are
    handed to the reader. Returns an empty DataFrame with the table
    schema when every file prunes away.

    Selection is inlined rather than via ``files_overlapping``: that
    helper's no-stats fallback substitutes the KEY column's min/max,
    which is sound only when ``col`` IS the table key — here ``col`` is
    arbitrary, so a file with no stats for it must simply be read."""
    files = []
    for a in live_files(table, version):
        cs = a.get("col_stats", {}).get(col)
        if cs is None or not _stats_disjoint(cs[0], cs[1], lo, hi):
            files.append(a)
    if not files:
        return read(spark, table, version).where(F.lit(False))
    return _read_files(spark, table, files, version).where(
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )


def _driver_exact_touched(
    table: str, candidates: list[dict], keyset: set, key: str, ktype: str
) -> list[dict] | None:
    """EXACT touched-file discovery driver-side: read each candidate's
    key column via pyarrow and intersect with the probed key set — no
    Spark job, and a disjoint-key source stays a pure append. Returns
    None when the distributed semi-join must decide instead: too many /
    too large / row-countless candidate files, or a key type whose
    pyarrow decoding isn't trivially equal to Spark's collect
    (int/long/string only). Key columns are rename-protected
    (identity-mapped), so the physical column name IS the logical one."""
    if ktype not in ("integer", "long", "string"):
        return None
    if len(candidates) > MERGE_DRIVER_DISCOVERY_MAX_FILES:
        return None
    if any(
        "rows" not in a or a["rows"] > BLOOM_DRIVER_MAX_ROWS
        for a in candidates
    ):
        return None
    touched = []
    for a in candidates:
        try:
            col = (
                pq.read_table(_abs(table, a["file"]), columns=[key])
                .column(0)
                .to_pylist()
            )
        except Exception:
            return None
        if any(v in keyset for v in col):
            touched.append(a)
    return touched


def merge_into(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    key: str,
    merge_schema: bool = False,
    source_rows: list | None = None,
) -> int:
    """MERGE INTO target USING source ON target.key = source.key
    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * —
    dbt's merge-strategy incremental materialization.

    ``merge_schema=True`` permits ADDITIVE schema evolution in the
    merge (Delta's ``withSchemaEvolution()``): new nullable source
    columns join the table schema, carried-over rows in rewritten
    files null-fill them, untouched files null-fill on read via the
    log schema. Without it a differing source schema raises
    SchemaMismatch (same posture as ``append``).

    Execution (the Delta MERGE shape):
    0. ONE bounded probe job: collect up to MERGE_SOURCE_PROBE_MAX_ROWS+1
       source rows (key + bloom probe positions; LIMIT over the bare
       scan early-exits at scale). A small source — streaming label /
       registry maintenance, CDC micro-batches — then resolves its key
       range, bloom masks, AND the touched-file set driver-side without
       the three separate Spark jobs the generic path needs (round-14
       fix: the fixed per-batch job overhead dominated churn-scale
       MERGEs, see BENCH_SUMMARY maintenance_split r13).
    1. Prune candidate files by the log's min/max key stats against the
       source's key range — from the probe when small, else one tiny
       aggregate over the source.
    2. Bloom-prune the survivors (small sources only: with BLOOM_BITS =
       1024 a >100k-key probe saturates every mask anyway, and the
       pre-round-14 unbounded distinct-keys collect was a driver OOM
       at 100 TB scale).
    3. Find files ACTUALLY containing matched keys — EXACTLY, on both
       paths. Small source over few small files: pyarrow key-column
       reads driver-side against the probed key set (no Spark job; a
       disjoint-key micro-batch stays a pure append). Generic path:
       semi-join the pruned target subset (tagged with
       input_file_name) against source keys; collect the distinct
       file names (small: O(files), not O(rows)).
    4. Rewrite only the touched files: their rows anti-join the source
       keys (an isin() filter when the probed key set is in hand),
       union the full source, write as new files (repartition(1) when
       the row bound says the rewrite is metadata-scale). Untouched
       files carry over by reference — no full-table rewrite.
    """
    if not versions(table):
        return create_or_replace(spark, table, source, key)
    if pending_tombstones(table):
        raise ValueError(
            "table has pending deferred deletes; run materialize_tombstones "
            "before MERGE"
        )
    source, evolved_schema = _evolve_schema(table, source, merge_schema)
    _enforce_constraints(source, current_constraints(table), "MERGE")

    live = live_files(table)

    # (0) bounded probe, LIMIT dial+1. The limit sits on the bare scan
    # (no distinct), so it early-exits once the budget is hit — at
    # 100 TB the probe cost is bounded regardless of source size;
    # driver memory is bounded by the dial in all cases (the
    # pre-round-14 bloom probe collected EVERY distinct source key).
    # Round 15: for the key types every other driver path supports
    # (int/long/string), the probe collects the FULL source rows — the
    # same one job — and the per-key bloom masks come from the
    # test-pinned Python XXH64 twin, so a churn-scale MERGE whose
    # touched files also resolve driver-side can write its rewrite with
    # _stage_rows_local and ZERO further Spark jobs. Other key types
    # keep the Spark-expression probe (their string cast is not
    # trivially replicable driver-side).
    ktype = source.schema[key].dataType.typeName() if key in source.columns else None
    probe_rows = None  # full source rows, when the key is driver-maskable
    src_key_masks: dict = {}
    src_keyset: set = set()
    if ktype in ("integer", "long", "string"):
        # rows already in the caller's hand (``source_rows``, positional
        # in source.schema order) skip even the probe job
        ki = source.columns.index(key)
        probe_rows = (
            list(source_rows)
            if source_rows is not None
            and len(source_rows) <= MERGE_SOURCE_PROBE_MAX_ROWS
            else source.limit(MERGE_SOURCE_PROBE_MAX_ROWS + 1).collect()
        )
        n_probe = len(probe_rows)
        small_source = n_probe <= MERGE_SOURCE_PROBE_MAX_ROWS
        if small_source:
            src_keyset = {r[ki] for r in probe_rows if r[ki] is not None}
            # masks only below the saturation dial: with BLOOM_BITS=1024
            # and BLOOM_K=4, a >~2k-key union mask has essentially every
            # bit set and prunes nothing — above it, skip the serial
            # driver hashing outright (the pre-round-15 Spark-side probe
            # computed positions for up to 20k keys that could never
            # prune)
            if len(src_keyset) <= BLOOM_PROBE_MAX_KEYS:
                for v in src_keyset:
                    src_key_masks[v] = _bloom_mask_py(
                        [v if ktype == "string" else str(v)]
                    )
    else:
        probe = (
            source.select(
                F.col(key).alias("__k"),
                _bloom_positions(F.col(key).cast("string")).alias("__ps"),
            )
            .limit(MERGE_SOURCE_PROBE_MAX_ROWS + 1)
            .collect()
        )
        n_probe = len(probe)
        small_source = n_probe <= MERGE_SOURCE_PROBE_MAX_ROWS
        if small_source:
            for r in probe:
                if r["__k"] is not None and r["__k"] not in src_key_masks:
                    m = 0
                    for p in r["__ps"]:
                        m |= 1 << int(p)
                    src_key_masks[r["__k"]] = m
            src_keyset = set(src_key_masks)

    # (1) stats pruning: a file can only contain matches if its key range
    # intersects the source's key range. Small source: bounds come from
    # the probe (Python min/max matches SQL ordering for all orderable
    # key types — ints, floats, strings by code point == UTF-8 bytes,
    # dates, timestamps, decimals — pinned by test). Else: one tiny
    # map-side-combinable aggregate.
    if small_source:
        ks = list(src_keyset)
        rng = {"lo": min(ks) if ks else None, "hi": max(ks) if ks else None}
    else:
        rng = source.agg(
            F.min(F.col(key)).alias("lo"), F.max(F.col(key)).alias("hi")
        ).collect()[0]
    # stats in the log are JSON-sanitized; convert the probe bounds the
    # same way so date/timestamp keys compare as ISO strings and decimal
    # keys as floats — widening the probe range outward keeps pruning
    # sound against the (also-widened) stored bounds
    lo = _json_stat(rng["lo"], side="lo") if rng["lo"] is not None else None
    hi = _json_stat(rng["hi"], side="hi") if rng["hi"] is not None else None
    if lo is None or hi is None:
        # empty source (or all-NULL keys): no file can match — the
        # comparisons below would raise TypeError against None
        # (round-7 review; empty micro-batches reach here via
        # streaming foreachBatch)
        candidates = []
    else:
        candidates = [
            a
            for a in live
            if "min_key" not in a
            or not _stats_disjoint(a["min_key"], a["max_key"], lo, hi)
        ]
    untouched_by_stats = [a for a in live if a not in candidates]

    # (2) bloom pruning: drop candidate files whose bloom rejects every
    # source key — the layer that works where min/max can't (hash
    # layouts, full-range files). Masks come from the bounded probe; a
    # quick union-mask reject handles most files in O(1) before the
    # per-key test. Sound: a bloom never rejects a present key, so
    # skipped files contain no matches and carry over by reference
    # exactly like range-pruned ones. Above the dial the masks would be
    # saturated (1024 bits) and pruning power ~zero, so the stage only
    # runs for small sources.
    pruned_by_bloom = 0
    if (
        candidates
        and small_source
        and src_key_masks  # empty above BLOOM_PROBE_MAX_KEYS (no pruning power)
        and all("bloom" in a for a in candidates)
    ):
        masks = list(src_key_masks.values())
        union_mask = 0
        for m in masks:
            union_mask |= m
        kept_candidates = []
        for a in candidates:
            fmask = int(a["bloom"], 16)
            if (fmask & union_mask) and any((m & fmask) == m for m in masks):
                kept_candidates.append(a)
        pruned_by_bloom = len(candidates) - len(kept_candidates)
        untouched_by_stats += [a for a in candidates if a not in kept_candidates]
        candidates = kept_candidates

    touched: list[dict] = []
    driver_touched = (
        _driver_exact_touched(
            table,
            candidates,
            src_keyset,
            key,
            source.schema[key].dataType.typeName(),
        )
        if candidates and small_source
        else None
    )
    # the touched set is EXACTLY known driver-side either when the
    # pyarrow discovery succeeded or when pruning left no candidates at
    # all (a disjoint-key micro-batch — the common novel-batch case)
    touched_exact_driver = driver_touched is not None or not candidates
    if driver_touched is not None:
        # (3, small source) exact driver-side discovery succeeded — no
        # Spark job, disjoint-key micro-batches stay pure appends
        touched = driver_touched
    elif candidates:
        # (3, generic) exact touched-file discovery, fully distributed
        # (log-schema read: a mixed pre-/post-evolution candidate set
        # must not take an arbitrary footer as its schema)
        src_keys = source.select(F.col(key).alias("__mk")).distinct()
        hit_files = {
            os.path.basename(r["__f"])
            for r in _read_files(
                spark, table, candidates, None, with_tombstones=False
            )
            .select(F.col(key), F.input_file_name().alias("__f"))
            .join(F.broadcast(src_keys), F.col(key) == F.col("__mk"), "left_semi")
            .select("__f")
            .distinct()
            .collect()
        }
        # basename match: a shallow clone's actions reference absolute
        # source paths while input_file_name yields bare names (names
        # are uuid-unique, so basename equality is exact)
        touched = [
            a for a in candidates if os.path.basename(a["file"]) in hit_files
        ]

    untouched = untouched_by_stats + [a for a in candidates if a not in touched]

    # (4a, round 15) FULLY driver-side rewrite: when the probe holds the
    # complete source rows, the touched set is exactly known
    # driver-side, the row bound is metadata-scale, the schema has no
    # in-flight evolution, and every type has a value-exact pyarrow
    # twin — the merged rows (touched-file rows whose key misses the
    # source keyset, plus the source rows) are assembled in Python and
    # staged with _stage_rows_local: ZERO further Spark jobs after the
    # one bounded probe. The touched files were already read once by
    # _driver_exact_touched (key column); re-reading them fully here is
    # bounded by the same dials.
    driver_write = (
        small_source
        and probe_rows is not None
        and touched_exact_driver
        and all("rows" in a for a in touched)
        and sum(a["rows"] for a in touched) + n_probe <= STAGE_DRIVER_MAX_ROWS
        and [(f.name, f.dataType) for f in source.schema.fields]
        == [(f.name, f.dataType) for f in evolved_schema.fields]
        and _stage_local_ok(
            source.schema,
            key,
            _effective_stats_cols(table, source.columns, None),
        )
    )
    if driver_write:
        mapping = current_mapping(table)
        names = [f.name for f in source.schema.fields]
        merged_rows: list = []
        for a in touched:
            t = pq.read_table(_abs(table, a["file"]))
            present = set(t.column_names)
            n = t.num_rows
            colvals = [
                (
                    t.column(mapping.get(c, c)).to_pylist()
                    if mapping.get(c, c) in present
                    else [None] * n  # pre-evolution file: null-fill
                )
                for c in names
            ]
            kvals = colvals[names.index(key)]
            for i in range(n):
                # NULL target keys survive, matching the NOT-IN +
                # isNull() filter of the distributed rewrite
                if kvals[i] is None or kvals[i] not in src_keyset:
                    merged_rows.append(tuple(cv[i] for cv in colvals))
        merged_rows.extend(probe_rows)
        adds = _stage_rows_local(
            table, merged_rows, source.schema, key, mapping=mapping
        )
    else:
        # (4b) rewrite touched rows + insert source (log-schema read — a
        # footer read of a pre-evolution touched file would rewrite it
        # without the evolved columns, permanently losing that data)
        if touched:
            kept = _read_files(spark, table, touched, None, with_tombstones=False)
            if small_source and len(src_keyset) <= MERGE_ISIN_MAX_KEYS:
                # keys are in hand: an isin() filter folds the anti-join
                # into the rewrite job's scan (no broadcast-build job).
                # NULL target keys must survive the NOT-IN (SQL
                # three-valued logic would drop them).
                kept = kept.where(
                    ~F.col(key).isin(list(src_keyset)) | F.col(key).isNull()
                )
            else:
                kept = kept.join(source.select(key).distinct(), key, "left_anti")
            # allowMissingColumns only under declared evolution: carried
            # rows null-fill new source columns (and an evolving source
            # may omit historical columns, mirroring append's posture) —
            # but an UNdeclared mismatch must keep failing loudly
            merged = kept.unionByName(source, allowMissingColumns=merge_schema)
        else:
            merged = source
        # Metadata-scale rewrites collapse to one task/file: the row
        # bound (logged touched-file rows + probed source rows) is exact
        # from stats already in hand, and N near-empty shuffle
        # partitions would otherwise become N write tasks + N files +
        # N bloom/footer reads per churn batch, decaying the table
        # layout merge after merge. repartition, NOT coalesce:
        # coalesce(1) would pull the source pipeline's whole final stage
        # into one task (measured 2.5× slower on the maintenance verdict
        # MERGE); the explicit exchange keeps upstream parallelism and
        # single-tasks only the tiny write.
        if small_source and all("rows" in a for a in touched):
            bound = sum(a["rows"] for a in touched) + n_probe
            if bound <= MERGE_COALESCE_MAX_ROWS:
                merged = merged.repartition(1)
        adds = _stage_files(merged, table, key)

    v = versions(table)[-1] + 1
    _commit_exclusive(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": "MERGE",
            "key": key,
            "schema_json": evolved_schema.json(),
            "add": adds,
            "remove": [a["file"] for a in touched],
            "stats": {
                "files_pruned_by_stats": len(untouched_by_stats),
                "files_pruned_by_bloom": pruned_by_bloom,
                "files_touched": len(touched),
                "files_untouched": len(untouched),
            },
        },
    )
    return v


CDC_DELETED_COL = "__cdc_deleted"


def apply_changes(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    key: str,
    seq_cols: list,
    op_col: str = "op",
    delete_value: str = "D",
) -> int:
    """CDC APPLY — the Delta Live Tables ``apply_changes`` /
    ``MERGE ... WHEN MATCHED [AND op='D'] THEN DELETE`` shape: fold a
    changelog (upserts + deletes, each row carrying a sequencing key)
    into a keyed snapshot table, out-of-order-safe and
    replay-idempotent.

    ``source`` = the table's data columns plus ``op_col`` ('D' rows
    are deletes; anything else upserts). ``seq_cols`` (non-NULL,
    columns of the table, compared lexicographically as a struct)
    order the changelog per key:

    - Within the source, only the LATEST change per key applies
      (max over ``struct(seq_cols..., op, ...)`` — a map-side-
      combinable hash aggregate, so a hot key never funnels raw
      changelog rows into one task).
    - Against the stored row, a change applies only if its seq struct
      is STRICTLY greater — a replayed batch (equal seq) and a late
      straggler batch (lower seq) both no-op instead of clobbering
      newer state. This is what makes foreachBatch restart safety
      free: re-delivery is absorbed by sequencing, not by careful
      batch-boundary engineering.
    - A winning 'D' drops the row; a delete for an absent key no-ops.

    Deletes RETAIN A TOMBSTONE: a winning 'D' keeps the key's row with
    ``__cdc_deleted = true`` at the delete's seq, so an out-of-order
    upsert OLDER than the delete arriving in a later batch cannot
    resurrect the key (the classic CDC hazard; Delta's CDC apply keeps
    the same hidden tombstones). Read live state through
    ``read_cdc_state``; reclaim old tombstones with
    ``purge_cdc_tombstones`` once the feed guarantees no more
    stragglers (the retention knob every CDC sink has).

    File mechanics are MERGE's (stats + bloom pruned candidates, exact
    touched-file discovery, rewrite ∝ touched files, untouched files
    carry by reference); a batch that changes nothing commits nothing.
    Returns the table version (new or unchanged).
    """
    if not versions(table):
        # latest FIRST, then flag deletes: a delete-after-upsert within
        # the creating batch must not resurrect the earlier upsert, and
        # delete-of-unseen keys must still leave tombstones
        latest0 = _latest_changes(source, key, seq_cols, op_col)
        first = latest0.withColumn(
            CDC_DELETED_COL, F.col(op_col) == F.lit(delete_value)
        ).drop(op_col)
        return create_or_replace(spark, table, first, key)
    if pending_tombstones(table):
        raise ValueError(
            "table has pending deferred deletes; run materialize_tombstones "
            "before APPLY CHANGES"
        )
    sch = current_schema(table)
    if sch is not None and CDC_DELETED_COL not in [f.name for f in sch.fields]:
        # a pre-existing non-CDC table has no tombstone column: winning
        # deletes would silently survive as live rows. apply_changes
        # owns its target from creation (the DLT contract).
        raise ValueError(
            f"{table} is not an apply_changes target (missing "
            f"{CDC_DELETED_COL}); create it via apply_changes itself"
        )
    latest = _latest_changes(source, key, seq_cols, op_col).localCheckpoint(
        eager=False
    )
    _enforce_constraints(
        latest.where(F.col(op_col) != F.lit(delete_value)).drop(op_col),
        current_constraints(table),
        "APPLY CHANGES",
    )

    live = live_files(table)
    # bounded probe first (round 14, same shape as merge_into): a
    # churn-scale changelog resolves its key range AND the exact
    # touched-file set driver-side — the per-batch fixed job overhead
    # is what dominates CDC micro-batches; LIMIT early-exits the scan
    # at scale, and latest's lazy checkpoint makes the probe's
    # materialization reusable by every later consumer
    probe = (
        latest.select(F.col(key).alias("__k"))
        .limit(MERGE_SOURCE_PROBE_MAX_ROWS + 1)
        .collect()
    )
    small_source = len(probe) <= MERGE_SOURCE_PROBE_MAX_ROWS
    if small_source:
        ks = [r["__k"] for r in probe if r["__k"] is not None]
        rng = {"lo": min(ks) if ks else None, "hi": max(ks) if ks else None}
    else:
        rng = latest.agg(
            F.min(F.col(key)).alias("lo"), F.max(F.col(key)).alias("hi")
        ).collect()[0]
    lo = _json_stat(rng["lo"], side="lo") if rng["lo"] is not None else None
    hi = _json_stat(rng["hi"], side="hi") if rng["hi"] is not None else None
    if lo is None or hi is None:
        candidates = []  # empty changelog (or all-NULL keys)
    else:
        candidates = [
            a
            for a in live
            if "min_key" not in a
            or not _stats_disjoint(a["min_key"], a["max_key"], lo, hi)
        ]
    touched: list[dict] = []
    driver_touched = (
        _driver_exact_touched(
            table,
            candidates,
            {r["__k"] for r in probe if r["__k"] is not None},
            key,
            latest.schema[key].dataType.typeName(),
        )
        if candidates and small_source
        else None
    )
    if driver_touched is not None:
        touched = driver_touched
    elif candidates:
        src_keys = latest.select(F.col(key).alias("__mk")).distinct()
        hit_files = {
            os.path.basename(r["__f"])
            for r in _read_files(
                spark, table, candidates, None, with_tombstones=False
            )
            .select(F.col(key), F.input_file_name().alias("__f"))
            .join(F.broadcast(src_keys), F.col(key) == F.col("__mk"), "left_semi")
            .select("__f")
            .distinct()
            .collect()
        }
        touched = [
            a for a in candidates if os.path.basename(a["file"]) in hit_files
        ]
    untouched = [a for a in live if a not in touched]

    src_cols = latest.columns
    pref = latest.select([F.col(c).alias("__s_" + c) for c in src_cols])
    src_flag = (F.col("__s_" + op_col) == F.lit(delete_value)).alias(
        CDC_DELETED_COL
    )
    if touched:
        # ONE materialization of the stored⋈changes pipeline (round 15):
        # the previous shape executed the join up to four times per
        # micro-batch — once for the deleted-keys count, twice for the
        # has-changes probes, once more for the rewrite itself. The
        # kept/updated split is now a per-row CASE carrying marker
        # columns, eagerly checkpointed; the counts become metadata-scale
        # actions over the checkpoint and the rewrite projects it.
        stored = _read_files(spark, table, touched, None, with_tombstones=False)
        tbl_cols = stored.columns
        j = stored.join(pref, F.col(key) == F.col("__s_" + key), "left")
        newer = F.col("__s_" + key).isNotNull() & (
            F.struct(*[F.col("__s_" + c) for c in seq_cols])
            > F.struct(*[F.col(c) for c in seq_cols])
        )
        upd = F.coalesce(newer, F.lit(False))
        src_del = F.col("__s_" + op_col) == F.lit(delete_value)
        survivors = j.select(
            *[
                F.when(
                    upd,
                    src_del if c == CDC_DELETED_COL else F.col("__s_" + c),
                )
                .otherwise(F.col(c))
                .alias(c)
                for c in tbl_cols
            ],
            upd.alias("__chg"),
            (
                upd
                & (F.col("__s_" + op_col) == F.lit(delete_value))
                & ~F.col(CDC_DELETED_COL)
            ).alias("__new_del"),
        )
        inserts = latest.join(
            stored.select(key).distinct(), key, "left_anti"
        ).select(
            *[
                (F.col(op_col) == F.lit(delete_value)).alias(CDC_DELETED_COL)
                if c == CDC_DELETED_COL
                else F.col(c)
                for c in tbl_cols
            ],
            F.lit(True).alias("__chg"),
            F.lit(False).alias("__new_del"),
        )
        flagged = survivors.unionByName(inserts).localCheckpoint(eager=True)
        n_deleted_keys = flagged.where(F.col("__new_del")).count()
        n_changes = flagged.where(F.col("__chg")).limit(1).count()
        merged = flagged.select(*tbl_cols)
    else:
        # discovery is sound: no touched file ⇒ no source key exists in
        # the table ⇒ every change is a pure insert (deletes of unseen
        # keys insert tombstones so older stragglers can't resurrect)
        tbl_cols = [c for c in src_cols if c != op_col] + [CDC_DELETED_COL]
        n_deleted_keys = 0
        merged = latest.withColumn(
            CDC_DELETED_COL, F.col(op_col) == F.lit(delete_value)
        ).select(*tbl_cols)
        n_changes = merged.limit(1).count()
    # a batch that changes nothing (pure replay / stale stragglers)
    # must not commit an empty rewrite
    if n_changes == 0:
        return versions(table)[-1]
    # metadata-scale rewrites collapse to one task/file (merge_into's
    # round-14 rule; repartition, not coalesce — see there)
    if small_source and all("rows" in a for a in touched):
        if sum(a["rows"] for a in touched) + len(probe) <= MERGE_COALESCE_MAX_ROWS:
            merged = merged.repartition(1)
    adds = _stage_files(merged, table, key)
    v = versions(table)[-1] + 1
    _commit_exclusive(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": "APPLY_CHANGES",
            "key": key,
            "add": adds,
            "remove": [a["file"] for a in touched],
            "stats": {
                "files_touched": len(touched),
                "files_untouched": len(untouched),
                "keys_deleted": int(n_deleted_keys),
            },
        },
    )
    return v


def verify_table(spark: SparkSession, table: str) -> dict:
    """Lakehouse FSCK — the integrity audit an operator runs after an
    incident (partial restore, manual file surgery, suspected bit rot)
    and a scheduled job runs continuously at fleet scale. Pure metadata
    + parquet FOOTER reads (O(live files), never row data), so it is
    safe to run against a 100 TB table.

    Checks, each an entry in the returned report's ``errors`` list when
    violated:

    - every live file exists on disk (a missing file = guaranteed
      future read failure; surfacing it NOW beats a 3 am pager),
    - every live file's logged ``rows`` matches its parquet footer
      row count (tampering / truncation / wrong-file-same-name),
    - per-file key stats are ordered (min_key <= max_key) — an
      inverted range silently disables pruning soundness,
    - the logged schema parses and every live footer's columns are a
      subset of it (a file with columns the schema lacks means a
      rewrite path lost a schema commit),
    - checkpoint states REPLAY-EQUAL: the newest readable checkpoint's
      folded state must equal a from-scratch log fold at its version —
      a divergent checkpoint would silently fork every subsequent read,
    - no dangling removes (a remove naming a file never added),
    - unresolved staged commits are reported (informational: WAP
      audits pending publish) in ``staged_pending``.

    Returns ``{"ok": bool, "files_checked": n, "errors": [...],
    "staged_pending": [...], "checks_skipped": bool}`` — report, don't
    raise: an auditor must enumerate EVERY problem, not stop at the
    first. ``checks_skipped`` is True on the early-return paths (no
    table, log gap, unreadable entry) where the file/schema/checkpoint
    checks never ran — absence of errors there is NOT health.
    """
    # staged_pending needs a log fold — fill it AFTER the coherence
    # checks below prove the log is foldable (round-9: a corrupt entry
    # crashed the audit right here, before any check could report it).
    # checks_skipped flags the early-return paths where the file/
    # schema/checkpoint checks never ran — without it a consumer
    # cannot tell "no staged writes, nothing else wrong" from "not
    # checked" (round-9 review), in tension with the enumerate-every-
    # problem contract.
    report: dict = {"ok": True, "files_checked": 0, "errors": [],
                    "staged_pending": [], "checks_skipped": False}
    vs = versions(table)
    if not vs:
        report["ok"] = False
        report["errors"].append(f"not a table: {table}")
        report["checks_skipped"] = True
        return report
    head = vs[-1]

    # log contiguity: a MISSING middle version would make every fold
    # silently skip it and serve a state no writer ever committed —
    # the worst failure mode an audit exists to catch (round-9 review:
    # versions() lists what's present; nothing else checked for gaps)
    missing_vs = sorted(set(range(0, head + 1)) - set(vs))
    if missing_vs:
        report["errors"].append(
            f"log gap: missing version(s) {missing_vs[:10]}"
            + ("…" if len(missing_vs) > 10 else "")
        )
        report["ok"] = False
        # a missing PREFIX corrupts the fold exactly like a missing
        # middle version (round-9 review follow-up: the early return
        # must apply to both, or every downstream check cascades bogus
        # errors off a truncated fold)
        report["checks_skipped"] = True
        return report

    # log coherence: every entry parses, adds/removes pair up. A
    # truncated/corrupt entry is REPORTED, not raised — an FSCK that
    # crashes on the corruption it audits is useless at 3 am.
    seen_adds: set = set()
    for v in vs:
        try:
            e = _read_entry(table, v)
        except Exception as exc:  # noqa: BLE001 — auditing, not crashing
            report["errors"].append(f"unreadable log entry v{v}: {exc}")
            report["ok"] = False
            report["checks_skipped"] = True
            return report  # folds below would diverge from reality
        for a in e.get("add", []):
            seen_adds.add(a["file"])
        for r in e.get("remove", []):
            if r not in seen_adds:
                report["errors"].append(
                    f"v{v}: remove of never-added file {r}"
                )
    report["staged_pending"] = sorted(_unresolved_staged(table))

    # schema parses
    sch = None
    try:
        sch = current_schema(table)
    except Exception as exc:  # noqa: BLE001 — auditing, not crashing
        report["errors"].append(f"schema unreadable: {exc}")
    # footers carry PHYSICAL names; dropped columns' retired physical
    # names remain legitimately inside old immutable files
    sch_cols = None
    if sch is not None:
        head_st = _state_at(table, head)
        sch_cols = {
            head_st["mapping"].get(f.name, f.name) for f in sch.fields
        } | set(head_st["retired"])

    # live files: existence + footer row count + stats sanity + columns
    for a in live_files(table):
        report["files_checked"] += 1
        path = _abs(table, a["file"])
        if not os.path.exists(path):
            report["errors"].append(f"missing data file: {a['file']}")
            continue
        try:
            md = pq.ParquetFile(path).metadata
        except Exception as exc:  # noqa: BLE001
            report["errors"].append(f"unreadable footer: {a['file']}: {exc}")
            continue
        if "rows" in a and md.num_rows != a["rows"]:
            report["errors"].append(
                f"row-count drift: {a['file']} log={a['rows']} "
                f"footer={md.num_rows}"
            )
        if "min_key" in a and "max_key" in a:
            lo, hi = a["min_key"], a["max_key"]
            try:
                if type(lo) is type(hi) and lo > hi:
                    report["errors"].append(
                        f"inverted key stats: {a['file']} [{lo}, {hi}]"
                    )
            except TypeError:
                pass  # mixed-generation stats: comparison not defined
        if sch_cols is not None:
            # top-level field names via the arrow schema (ParquetSchema
            # flattens nested paths; arrow keeps the logical columns)
            extra = set(md.schema.to_arrow_schema().names) - sch_cols
            if extra:
                report["errors"].append(
                    f"columns outside log schema: {a['file']}: {sorted(extra)}"
                )

    # checkpoint replay-equality at its own version
    ck = _latest_checkpoint(table, head)
    if ck is not None:
        ck_version, ck_state = ck
        scratch = _empty_state()
        for v in vs:
            if v > ck_version:
                break
            scratch = _fold_entry(scratch, _read_entry(table, v))
        # Compare the FULL folded state, field by field — a checkpoint
        # whose mapping/retired/key/constraints/partition/zorder/staged
        # diverged from the replay would alias columns (or admit
        # colliding names, or mis-partition writes) on checkpoint-seeded
        # reads while passing a live/schema/tombstones-only check
        # (round-8 review).
        diverged = [
            fld
            for fld in scratch
            if scratch.get(fld) != ck_state.get(fld)
        ]
        if diverged:
            report["errors"].append(
                f"checkpoint@v{ck_version} diverges from log replay "
                f"in {sorted(diverged)}"
            )

    report["ok"] = not report["errors"]
    return report


def read_cdc_state(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Live CDC state: ``read`` minus retained delete tombstones (and
    the hidden flag column) — what a consumer of an apply_changes
    target queries."""
    return (
        read(spark, table, version)
        .where(~F.col(CDC_DELETED_COL))
        .drop(CDC_DELETED_COL)
    )


def purge_cdc_tombstones(spark: SparkSession, table: str) -> int:
    """Reclaim retained CDC delete tombstones (the retention knob:
    safe once the feed guarantees no straggler older than the purged
    deletes can still arrive — purging earlier re-opens the
    resurrection window apply_changes' tombstones exist to close).
    Returns the new version (or the current one if nothing purged)."""
    has_tombstones = (
        read(spark, table).where(F.col(CDC_DELETED_COL)).limit(1).count() > 0
    )
    if not has_tombstones:
        return versions(table)[-1]
    return delete_where(spark, table, CDC_DELETED_COL)


def _latest_changes(
    source: DataFrame, key: str, seq_cols: list, op_col: str
) -> DataFrame:
    """Latest change per key: max over struct(seq_cols..., remaining
    columns) — deterministic even under seq ties (full-row
    lexicographic tie-break), skew-proof (partial aggregation)."""
    rest = [c for c in source.columns if c != key and c not in seq_cols]
    agg = source.groupBy(key).agg(
        F.max(F.struct(*seq_cols, *rest)).alias("__last")
    )
    return agg.select(
        key, *[F.col(f"__last.{c}").alias(c) for c in seq_cols + rest]
    )


def restore(table: str, to_version: int) -> int:
    """RESTORE TABLE ... TO VERSION AS OF — roll the HEAD back to an
    earlier snapshot as a NEW forward commit (Delta semantics: history
    is never rewritten, so the bad versions stay auditable and
    time-travelable and a second restore can undo the first).

    Pure metadata: the live set of ``to_version`` is re-declared by
    REFERENCE — files live at both HEAD and the target stay untouched,
    files dropped since the target are re-added, files added since are
    removed. No data file is read, written, or moved, which is what
    makes restore O(log) instead of O(table) at any scale.
    """
    vs = versions(table)
    if to_version not in vs:
        raise ValueError(f"version {to_version} not in {vs}")
    target = {a["file"]: a for a in live_files(table, to_version)}
    head = {a["file"]: a for a in live_files(table)}
    # a vacuumed-away snapshot must fail HERE with a clear message, not
    # later at scan time with a missing-file error on a "healthy" HEAD
    gone = [f for f in target if not os.path.exists(_abs(table, f))]
    if gone:
        raise FileNotFoundError(
            f"cannot restore {table} to v{to_version}: {len(gone)} data "
            f"file(s) were vacuumed past the retention horizon (e.g. {gone[0]})"
        )
    v = vs[-1] + 1
    # Re-declare the ENTIRE table state of to_version, not just its
    # file set (round-7 review): schema (a post-target REPLACE would
    # otherwise make read() null-fill every restored column), CHECK
    # constraints, tombstone state (pending deletes from the bad era
    # must not keep anti-filtering restored rows — the restored era's
    # own pending tombstones are re-declared), the column mapping and
    # retired physical names (restoring across a RENAME/DROP would
    # otherwise leave the stale mapping in the fold: the schema-merge
    # guard then admits a new column whose name aliases old file data,
    # and every later write crashes on the phantom collision — round-8
    # review repro), and the physical layout spec (partition/zorder).
    target_st = _state_at(table, to_version)
    target_schema = current_schema(table, to_version)
    entry = {
        "version": v,
        "timestamp": time.time(),
        "operation": f"RESTORE AS OF {to_version}",
        "key": _table_key_opt(table, to_version),
        "constraints": current_constraints(table, to_version),
        "tombstones_cleared": True,
        "tombstones": pending_tombstones(table, to_version),
        "column_mapping": dict(target_st["mapping"]),
        "retired_physical": list(target_st["retired"]),
        "partition_by": target_st["partition_by"],
        "zorder_by": list(target_st["zorder_by"]),
        "add": [a for f, a in target.items() if f not in head],
        "remove": [f for f in head if f not in target],
    }
    if target_schema is not None:
        entry["schema_json"] = target_schema.json()
    _commit_exclusive(table, entry)
    return v


def clone_table(source: str, dest: str, version: int | None = None) -> int:
    """SHALLOW CLONE (Delta CLONE semantics): ``dest`` becomes a new
    table whose v0 references ``source``'s live data files at
    ``version`` BY ABSOLUTE PATH — zero bytes copied, O(log) metadata.
    This is the dev/test branching primitive: at 100 TB a full copy is
    days of IO; a clone is one commit.

    Divergence is copy-on-write by construction: DML on the clone drops
    REFERENCES and writes files into the clone's own data dir (the
    source is never touched); writes to the source after the clone are
    invisible to the clone (its v0 pinned the file list). The clone
    carries the source's full table contract at the clone point —
    schema, key, CHECK constraints, declared partitioning, Z-order
    clustering, and PENDING merge-on-read tombstones (omitting those
    would resurrect logically deleted rows, e.g. an acknowledged
    erasure).

    CAVEAT (same as Delta shallow clones): VACUUMing the SOURCE past
    files a clone still references breaks the clone's reads — vacuum
    only walks a table's own data dir, so the clone's own VACUUM can
    never delete source bytes, but the reverse discipline is on the
    operator. ``export_snapshot`` relativizes referenced names on copy,
    so exporting a clone materializes it (deep copy).
    """
    vs = versions(source)
    if not vs:
        raise FileNotFoundError(f"not a deltalite table: {source}")
    if versions(dest):
        raise ValueError(f"clone target already exists: {dest}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in {vs}")
    st = _state_at(source, v)
    adds = []
    for a in st["live"].values():
        b = dict(a)
        b["file"] = os.path.abspath(_abs(source, a["file"]))
        adds.append(b)
    entry: dict = {
        "version": 0,
        "timestamp": time.time(),
        "operation": f"CLONE {os.path.abspath(source)} AS OF {v}",
        "key": st["key"],
        "constraints": dict(st["constraints"]),
        "tombstones": list(st["tombstones"]),
        "partition_by": st["partition_by"],
        "add": adds,
        "remove": [],
    }
    if st["schema_json"]:
        entry["schema_json"] = st["schema_json"]
    if st["zorder_by"]:
        entry["zorder_by"] = list(st["zorder_by"])
    if st["mapping"]:
        # referenced files carry the SOURCE's physical names: the clone
        # inherits the column mapping or its reads would null out every
        # renamed column
        entry["column_mapping"] = dict(st["mapping"])
    if st["retired"]:
        entry["retired_physical"] = list(st["retired"])
    try:
        _commit(dest, entry)
    except CommitConflict:
        # two racing clones to the same dest: the loser's condition IS
        # "target already exists" — surface the typed API error, not
        # the raw commit-protocol conflict
        raise ValueError(f"clone target already exists: {dest}") from None
    return 0


def vacuum_retain(table: str, retain_last: int) -> int:
    """Retention-bounded VACUUM: delete data files reachable ONLY from
    versions older than the last ``retain_last`` — the real Delta
    trade (reclaim storage, give up time travel past the horizon).
    The log entries themselves are kept (history stays auditable);
    reading a vacuumed-away snapshot fails at scan time, as in Delta.
    ``vacuum`` (below) is the conservative variant that preserves the
    FULL history and only drops never-committed staging orphans."""
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    vs = versions(table)
    keep: set[str] = set()
    for v in vs[-retain_last:]:
        for a in live_files(table, v):
            keep.add(a["file"])
    # unresolved WAP-staged files are pre-publish data, not garbage
    for adds in _unresolved_staged(table).values():
        for a in adds:
            keep.add(a["file"])
    data_dir = os.path.join(table, _DATA_DIR)
    n = 0
    for f in os.listdir(data_dir):
        if f.endswith(".parquet") and f not in keep:
            os.remove(os.path.join(data_dir, f))
            n += 1
    return n


def vacuum(table: str) -> int:
    """Delete data files referenced by NO version's live set and no
    longer reachable (here: files removed at or before the latest
    version that we choose to retain nothing of — simple variant:
    drop files not live at ANY retained version; retention = all
    versions, so only files never live (failed stagings) go). Returns
    number of files deleted. Kept deliberately conservative: time
    travel across the full history keeps working."""
    keep = set()
    for v in versions(table):
        for a in live_files(table, v):
            keep.add(a["file"])
    for adds in _unresolved_staged(table).values():
        for a in adds:
            keep.add(a["file"])  # pre-publish WAP data, not garbage
    data_dir = os.path.join(table, _DATA_DIR)
    n = 0
    for f in os.listdir(data_dir):
        if f.endswith(".parquet") and f not in keep:
            os.remove(os.path.join(data_dir, f))
            n += 1
    return n


_ZORDER_BITS = 16


def _zorder_column(df: DataFrame, cols: list[str]) -> DataFrame:
    """Append ``__z``: the Morton (bit-interleaved) code of ``cols``,
    each normalized to a 16-bit bucket by its global min/max (one tiny
    agg, broadcast back). Range-partitioning + sorting on __z clusters
    files along the space-filling curve, so per-file min/max stats stay
    tight on EVERY zorder dimension at once — the Delta OPTIMIZE ZORDER
    design. Bucket math is exact integer arithmetic."""
    rng = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(rng))
    n = len(cols)
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        bucket = F.expr(
            f"((cast(`{c}` as long) - cast(`__lo_{c}` as long)) "
            f"* {(1 << _ZORDER_BITS) - 1}) div "
            f"greatest(1L, cast(`__hi_{c}` as long) - cast(`__lo_{c}` as long))"
        )
        for j in range(_ZORDER_BITS):
            z = z + F.shiftleft(
                F.shiftright(bucket, j).bitwiseAND(F.lit(1)), j * n + ci
            )
    return out.withColumn("__z", z).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def files_overlapping(table: str, col: str, lo, hi, version: int | None = None) -> list[dict]:
    """Live files whose ``col`` min/max range intersects [lo, hi] — the
    data-skipping primitive a scan planner uses against the log's
    per-file stats. Files without stats for ``col`` are conservatively
    kept — NEVER substituted with another column's range (the round-7
    review killed a key-stats fallback here: comparing the KEY range
    against an arbitrary column's bounds silently pruned files that
    held matching rows)."""
    out = []
    for a in live_files(table, version):
        cs = a.get("col_stats", {}).get(col)
        if cs is None or not _stats_disjoint(cs[0], cs[1], lo, hi):
            out.append(a)
    return out


def optimize(
    spark: SparkSession,
    table: str,
    key: str | None = None,
    target_rows: int = 1_000_000,
    small_file_rows: int | None = None,
    zorder_by: list[str] | None = None,
) -> int:
    """OPTIMIZE (compaction): bin-pack small live files into ~target_rows
    files, range-clustered on ``key`` so the rewritten files carry TIGHT
    min/max stats (1-D clustering — the same reason Delta's OPTIMIZE
    ZORDER exists: compaction is the moment you get to re-sort data for
    skipping). Data content is unchanged; the commit is a new version
    (remove=small files, add=compacted files), so time travel still sees
    the pre-compaction layout.

    The small-files problem is the dominant operational cost of
    streaming/incremental ingestion at scale: every micro-batch MERGE
    adds O(batch) files, and scan latency degrades with file count, not
    data size. Returns the new version (or the current one if there was
    nothing to compact).

    Granularity note: on a PARTITION-declared table compaction
    clusters along the declared column and emits one file per
    partition-value range (``target_rows`` is not consulted) — right
    for the low-cardinality date/category partitions the declaration
    is meant for; a table whose partitions individually exceed a
    comfortable file size should be z-ordered instead (zorder keeps
    within-partition clustering AND splits by size).
    """
    import math

    prior = versions(table)
    if not prior:
        raise ValueError(f"table {table} does not exist")
    if key is None:
        # scan-back default: an optimize that omits the key must not
        # strip min/max key stats + blooms from every compacted file
        # (pruning-decay, round-7 review)
        key = _table_key_opt(table)
    # compaction is the natural rewrite point for merge-on-read debt:
    # pending deferred-delete tombstones materialize first, so the
    # compacted files are clean and readers drop the scan-time filter
    if pending_tombstones(table):
        materialize_tombstones(spark, table)
        prior = versions(table)
    threshold = small_file_rows if small_file_rows is not None else target_rows // 2
    live = live_files(table)
    small = [a for a in live if a["rows"] < threshold]
    if len(small) <= 1:
        return prior[-1]

    # log-schema read, NOT a footer read: compacting a schema-evolved
    # table from one file's footer would write the compacted files
    # without the evolved columns — silent, permanent data loss (the
    # round-7 review catch; regression-pinned in tests/test_lakehouse)
    df = _read_files(spark, table, small, None, with_tombstones=False)
    total = sum(a["rows"] for a in small)
    nfiles = max(1, math.ceil(total / target_rows))
    part_col = _table_partition_by(table)
    if zorder_by and part_col is not None and part_col in df.columns:
        # Delta semantics: ZORDER clusters WITHIN partitions — a global
        # z-sort across partition values would widen every file's
        # partition range and erase the declared layout
        n_part = max(df.select(part_col).distinct().count(), 1)
        df = (
            _zorder_column(df, zorder_by)
            .repartitionByRange(n_part, F.col(part_col))
            .sortWithinPartitions(part_col, "__z")
            .drop("__z")
        )
    elif zorder_by:
        df = (
            _zorder_column(df, zorder_by)
            .repartitionByRange(nfiles, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    elif part_col is not None and part_col in df.columns:
        # a PARTITIONED table compacts along its declared clustering
        # (Delta's OPTIMIZE works within partitions): bin-packing small
        # files across partition values would widen every file's
        # partition range and erase the layout the CREATE asked for.
        # Compacted file count = partition-value count (one clustered
        # file per range), not total/target_rows.
        df = _apply_partitioning(df, part_col)
    elif key is not None:
        df = df.repartitionByRange(nfiles, F.col(key))
    else:
        df = df.coalesce(nfiles)
    adds = _stage_files(df, table, key, stats_cols=zorder_by)

    v = prior[-1] + 1
    _commit_exclusive(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": "OPTIMIZE",
            "key": key,
            "zorder_by": zorder_by,
            "partition_by": part_col,
            "add": adds,
            "remove": [a["file"] for a in small],
            "stats": {
                "files_compacted": len(small),
                "files_written": len(adds),
                "rows": total,
            },
        },
    )
    return v


def clustering_depth(
    table: str, col: str | None = None, version: int | None = None
) -> dict:
    """Clustering-health metric (the Delta/Iceberg "clustering depth"):
    the maximum number of live files whose ``col`` min/max ranges
    overlap at a single point. Depth 1 = perfectly range-clustered
    (any point-lookup admits one file); depth N means a worst-case
    point-lookup or range scan must open N files, so skipping has
    decayed N-fold. Pure log metadata — no file I/O.

    Returns ``{"depth": int, "files": int, "files_with_stats": int,
    "clusters": [{"files": [...], "depth": int, "rows": int}, ...]}``
    where clusters are the connected components of interval overlap in
    ascending range order. Files without stats (or with
    incomparable mixed-generation stat types) land in a final
    conservative cluster with depth = its file count — they admit
    every probe, which IS worst-case depth.
    """
    key_col = _table_key_opt(table, version)
    if col is None:
        col = key_col
    intervals, statless = [], []
    for a in live_files(table, version):
        if col is not None and col == key_col and "min_key" in a:
            lo, hi = a["min_key"], a["max_key"]
        elif col is not None and "col_stats" in a and col in a["col_stats"]:
            lo, hi = a["col_stats"][col]
        else:
            statless.append(a)
            continue
        intervals.append((lo, hi, a))
    try:
        intervals.sort(key=lambda t: (t[0], t[1]))
    except TypeError:
        # mixed stat generations that do not compare: every file is a
        # candidate for every probe — one conservative cluster
        statless += [a for (_, _, a) in intervals]
        intervals = []
    clusters = []
    cur: list = []
    cur_hi = None
    for lo, hi, a in intervals:
        if cur and lo <= cur_hi:
            cur.append((lo, hi, a))
            cur_hi = max(cur_hi, hi)
        else:
            if cur:
                clusters.append(cur)
            cur, cur_hi = [(lo, hi, a)], hi
    if cur:
        clusters.append(cur)

    def _depth(members) -> int:
        # +1 sorts before -1 at equal coordinates: inclusive bounds, a
        # range ending where another starts DOES overlap it
        events = []
        for lo, hi, _ in members:
            events.append((lo, 0))
            events.append((hi, 1))
        events.sort()
        d = best = 0
        for _, kind in events:
            d += 1 if kind == 0 else -1
            best = max(best, d)
        return best

    out = []
    for members in clusters:
        out.append(
            {
                "files": [a["file"] for (_, _, a) in members],
                "depth": _depth(members),
                "rows": sum(a.get("rows", 0) for (_, _, a) in members),
            }
        )
    if statless:
        out.append(
            {
                "files": [a["file"] for a in statless],
                "depth": len(statless),
                "rows": sum(a.get("rows", 0) for a in statless),
            }
        )
    return {
        "depth": max((c["depth"] for c in out), default=0),
        "files": len(intervals) + len(statless),
        "files_with_stats": len(intervals),
        "clusters": out,
    }


def optimize_incremental(
    spark: SparkSession,
    table: str,
    key: str | None = None,
    max_depth: int = 2,
    target_rows: int = 1_000_000,
) -> int:
    """Incremental OPTIMIZE — rewrite ONLY the overlap clusters whose
    clustering depth exceeds ``max_depth``, leaving well-clustered
    files untouched. At 100 TB a full-table OPTIMIZE is not an option;
    the operational loop is: churn (MERGE/append) decays clustering in
    the hot key ranges → ``clustering_depth`` finds the decayed
    regions → this rewrites exactly those regions, range-clustered, in
    one commit. Cost ∝ decayed data, not table size (the same
    churn-not-corpus contract as CDF and the incremental mart
    refresh).

    A rewrite batches every offending cluster in ONE commit (one
    log entry, atomic); each cluster re-splits at ``target_rows``.
    Returns the new version, or the current one when no cluster
    exceeds ``max_depth``.
    """
    import math

    prior = versions(table)
    if not prior:
        raise ValueError(f"table {table} does not exist")
    if key is None:
        key = _table_key_opt(table)
    if pending_tombstones(table):
        materialize_tombstones(spark, table)
        prior = versions(table)
    rep = clustering_depth(table, key)
    bad = [c for c in rep["clusters"] if c["depth"] > max_depth]
    if not bad:
        return prior[-1]
    by_name = {a["file"]: a for a in live_files(table)}
    adds: list[dict] = []
    removed: list[str] = []
    for c in bad:
        members = [by_name[f] for f in c["files"]]
        df = _read_files(spark, table, members, None, with_tombstones=False)
        nfiles = max(1, math.ceil(c["rows"] / target_rows))
        if key is not None:
            df = df.repartitionByRange(nfiles, F.col(key)).sortWithinPartitions(
                key
            )
        else:
            df = df.coalesce(nfiles)
        adds += _stage_files(df, table, key)
        removed += c["files"]
    v = prior[-1] + 1
    _commit_exclusive(
        table,
        {
            "version": v,
            "timestamp": time.time(),
            "operation": "OPTIMIZE INCREMENTAL",
            "key": key,
            "add": adds,
            "remove": removed,
            "stats": {
                "clusters_rewritten": len(bad),
                "files_rewritten": len(removed),
                "files_carried": len(by_name) - len(removed),
                "depth_before": rep["depth"],
            },
        },
    )
    return v


def delete_where(
    spark: SparkSession,
    table: str,
    predicate: str,
    _clear_tombstones: bool = False,
    _candidate_keys: list | None = None,
) -> int:
    """DELETE FROM table WHERE predicate — the Delta DELETE shape (GDPR
    erasure, retention enforcement). ``_clear_tombstones`` is set by
    ``materialize_tombstones`` so the rewrite and the tombstone-list
    clear land in ONE atomic commit.

    Touched-file discovery is exact and distributed: live files are read
    with input_file_name(), rows matching the predicate name the files
    to rewrite; every other file carries over by reference. A touched
    file is rewritten WITHOUT its matching rows (dropped entirely when
    nothing survives). At 100 TB a targeted delete rewrites the handful
    of files holding the keys, never the table.
    """
    vs = versions(table)
    if not vs:
        raise ValueError(f"table {table} does not exist")
    live = live_files(table)
    # key-list deletes (materialize_tombstones) bound the discovery
    # scan with the log's blooms + key stats — O(candidate files), not
    # O(table); sound because a bloom never rejects a present key.
    # Arbitrary predicates still scan all live files.
    scan = (
        files_maybe_containing(spark, table, _candidate_keys)
        if _candidate_keys
        else live
    )
    # log-schema reads (footer schema would drop evolved columns from
    # the rewritten files); raw tombstone view — materialization must
    # SEE the rows it deletes
    if scan:
        tagged = _read_files(
            spark, table, scan, None, with_tombstones=False
        ).withColumn("__f", F.input_file_name())
        hit_files = {
            os.path.basename(r["__f"])
            for r in tagged.where(predicate).select("__f").distinct().collect()
        }
    else:
        hit_files = set()
    # basename match (see merge_into: clone actions are absolute paths)
    touched = [a for a in live if os.path.basename(a["file"]) in hit_files]
    # scan-back, not last-entry: a metadata-only commit before this
    # delete must not strip min/max key stats + blooms from the
    # rewritten files (they feed MERGE file pruning forever after)
    key = _table_key_opt(table)

    adds: list[dict] = []
    n_deleted = 0
    if touched:
        tdf = _read_files(spark, table, touched, None, with_tombstones=False)
        kept = tdf.where(f"not ({predicate})")
        n_kept = kept.count()
        n_deleted = sum(a["rows"] for a in touched) - n_kept
        if n_kept:
            adds = _stage_files(kept, table, key)

    v = vs[-1] + 1
    entry = {
        "version": v,
        "timestamp": time.time(),
        "operation": "DELETE",
        "key": key,
        "predicate": predicate,
        "add": adds,
        "remove": [a["file"] for a in touched],
        "stats": {
            "files_touched": len(touched),
            "files_untouched": len(live) - len(touched),
            "rows_deleted": n_deleted,
        },
    }
    if _clear_tombstones:
        entry["operation"] = "MATERIALIZE TOMBSTONES"
        entry["tombstones_cleared"] = True
    _commit_exclusive(table, entry)
    return v


def export_snapshot(
    spark: SparkSession,
    table: str,
    dest: str,
    version: int | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    """Export a committed snapshot as PLAIN parquet any engine can read —
    the interop escape hatch for the custom transaction log (a real user's
    first question: "can I read this from another engine?").

    Layout at ``dest``:
      - ``*.parquet`` — the snapshot's data (no transaction log, no
        sidecar requirements; ``spark.read.parquet(dest)`` / DuckDB
        ``read_parquet('dest/*.parquet')`` / Hive-style partition dirs
        when ``partition_by`` is given)
      - ``_MANIFEST.json`` — table name, version, file list with row
        counts, total rows, and the log stats carried over
      - ``_SUCCESS`` — written LAST, so a partially-copied export is
        detectable (readers of the manifest check it first)

    Default path copies the immutable live files byte-for-byte (zero
    decode/encode; on a real object store this is a server-side copy /
    distcp, O(live files) metadata ops, no cluster time). With
    ``partition_by`` the snapshot is rewritten through Spark's Hive-style
    partitioned writer instead — one full pass, but the export becomes
    partition-prunable for downstream engines.
    """
    files = live_files(table, version)
    vs = versions(table)
    v = version if version is not None else vs[-1]
    os.makedirs(dest, exist_ok=True)

    manifest: dict = {
        "table": os.path.basename(os.path.normpath(table)),
        "version": v,
        "exported_at": time.time(),
        "key": _table_key_opt(table, v),
        "partition_by": partition_by or [],
        "files": [],
    }
    if partition_by:
        df = read(spark, table, version)
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(dest)
        for root, _dirs, names in os.walk(dest):
            for f in sorted(names):
                if f.endswith(".parquet"):
                    rel = os.path.relpath(os.path.join(root, f), dest)
                    md = pq.ParquetFile(os.path.join(root, f)).metadata
                    manifest["files"].append({"file": rel, "rows": md.num_rows})
    else:
        # the byte-copy fast path ships RAW files: it must refuse while
        # merge-on-read tombstones are pending, or the export would
        # resurrect logically deleted rows (e.g. an acknowledged GDPR
        # erasure) that the partition_by path — which goes through
        # read() — correctly filters (round-7 review)
        if pending_tombstones(table, version):
            raise ValueError(
                "snapshot has pending deferred deletes; run "
                "materialize_tombstones before a byte-copy export (or "
                "export with partition_by, which rewrites through read())"
            )
        for a in files:
            # basename-ify: a shallow clone's actions reference ABSOLUTE
            # source paths; joining them into dest would "copy" a file
            # onto itself. Exporting relativizes (materializes) instead.
            rel_name = os.path.basename(a["file"])
            shutil.copy2(_abs(table, a["file"]), os.path.join(dest, rel_name))
            ent = dict(a)
            ent["file"] = rel_name
            manifest["files"].append(ent)
    manifest["total_rows"] = sum(f["rows"] for f in manifest["files"])
    with open(os.path.join(dest, "_MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    with open(os.path.join(dest, "_SUCCESS"), "w") as fh:
        fh.write("")
    return manifest


def table_changes(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
    key: str | None = None,
    include_preimage: bool = False,
) -> DataFrame:
    """Change data feed between two versions: one row per logically
    changed key with ``_change_type`` ∈ insert / delete /
    update_postimage (Delta CDF semantics; updates carry the post-image
    row, deletes the pre-image).

    Only files that ENTERED or LEFT the live set between the versions
    are read — rows in carried-over files cannot have changed, and
    rows merely moved by OPTIMIZE/MERGE carry-over cancel out via a
    full-outer join on key with a whole-row hash equality check. At
    100 TB the CDF cost scales with the churn, not the table.
    """
    if key is None:
        key = _table_key_opt(table)
    if key is None:
        raise ValueError("table_changes requires a key column")
    old_live = {a["file"] for a in live_files(table, from_version)}
    new_live = {a["file"] for a in live_files(table, to_version)}
    old_only = sorted(old_live - new_live)
    new_only = sorted(new_live - old_live)

    schema = read(spark, table, from_version).schema
    cols = [f.name for f in schema.fields]

    def _side(files: list[str], at_version: int | None) -> DataFrame:
        if not files:
            return spark.createDataFrame([], schema)
        # each side reads under ITS version's log schema (footer
        # inference breaks on schema-evolved tables: a pre-evolution
        # file lacks the evolved column and the select below would
        # raise; the log schema null-fills it — round-7 review)
        s = current_schema(table, at_version)
        m = current_mapping(table, at_version)
        df = spark.read.schema(
            _physical_schema(s if s is not None else schema, m)
        ).parquet(*[_abs(table, f) for f in files])
        return _map_to_logical(df, s if s is not None else schema, m)

    rowhash = F.md5(F.to_json(F.struct(*[F.col(c) for c in sorted(cols)])))
    old = _side(old_only, from_version).select(
        F.col(key).alias("__k"),
        rowhash.alias("__oh"),
        *[F.col(c).alias(f"__o_{c}") for c in cols],
    )
    new = _side(new_only, to_version).select(
        F.col(key).alias("__k"),
        rowhash.alias("__nh"),
        *[F.col(c).alias(f"__n_{c}") for c in cols],
    )
    j = old.join(new, "__k", "full_outer")
    change = (
        F.when(F.col("__oh").isNull(), F.lit("insert"))
        .when(F.col("__nh").isNull(), F.lit("delete"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("update_postimage"))
    )
    # post-image for insert/update, pre-image for delete — selected per
    # SIDE, not per column (a legitimately-NULL new value must not fall
    # back to the old value)
    picked = [
        F.when(F.col("__nh").isNotNull(), F.col(f"__n_{c}"))
        .otherwise(F.col(f"__o_{c}"))
        .alias(c)
        for c in cols
    ]
    out = (
        j.withColumn("_change_type", change)
        .where(F.col("_change_type").isNotNull())
        .select(*picked, "_change_type")
    )
    if include_preimage:
        # Delta emits update_preimage alongside update_postimage; the
        # pre-image carries the OLD column values — consumers that
        # track a derived grouping (incremental view maintenance) need
        # it to see the group a row LEFT, not only the one it joined
        # (round-7 review: a group_key reassignment left the old
        # group's mart row permanently stale without this)
        pre = (
            j.where(
                F.col("__oh").isNotNull()
                & F.col("__nh").isNotNull()
                & (F.col("__oh") != F.col("__nh"))
            )
            .select(
                *[F.col(f"__o_{c}").alias(c) for c in cols],
                F.lit("update_preimage").alias("_change_type"),
            )
        )
        out = out.unionByName(pre)
    return out
