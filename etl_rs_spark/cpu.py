"""Process-tree CPU accounting for load-immune cost gates.

Wall-clock on a shared host swings 2-4x with external load, so any
wall-ratio assertion ("late batches must not cost more than early
ones") eventually flakes. CPU time does not inflate under external
load: in local mode every executor thread lives in the one Spark JVM
and every vectorized UDF in its python worker children, so the CPU
consumed by a batch is the utime+stime delta of the JVM's process
TREE between the batch's start and end. /proc is the source (Linux
only — callers must tolerate ``None``): children are discovered by a
single ppid scan, and dead children are still counted exactly once
because their time folds into the parent's cutime/cstime at reap.
"""

from __future__ import annotations

import os

try:
    _CLK_TCK = os.sysconf("SC_CLK_TCK")
except (ValueError, OSError, AttributeError):  # non-POSIX
    _CLK_TCK = None

_JVM_PID: int | None = None


def jvm_pid(spark) -> int | None:
    """PID of the Spark JVM this session drives (cached; py4j call)."""
    global _JVM_PID
    if _JVM_PID is None:
        try:
            _JVM_PID = int(
                spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
            )
        except Exception:
            return None
    return _JVM_PID


def _read_stat(pid: str) -> tuple[int, int] | None:
    """(ppid, cpu_ticks incl. reaped children) from /proc/<pid>/stat."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            rest = f.read().rsplit(") ", 1)[1].split()
    except (OSError, IndexError):
        return None
    # after "(comm) ": state ppid pgrp ... utime(11) stime(12)
    # cutime(13) cstime(14), all 0-indexed into `rest`
    try:
        return int(rest[1]), (
            int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        )
    except (ValueError, IndexError):
        return None


def _scan_procs() -> tuple[dict, dict] | None:
    if _CLK_TCK is None or not os.path.isdir("/proc"):
        return None
    procs: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        st = _read_stat(d)
        if st is not None:
            procs[int(d)] = st
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    return procs, children


def _tree(root: int, procs: dict, children: dict) -> set[int]:
    out, stack = set(), [root]
    while stack:
        p = stack.pop()
        if p in out or p not in procs:
            continue
        out.add(p)
        stack.extend(children.get(p, []))
    return out


def process_tree_cpu_ms(root_pid: int) -> int | None:
    """Total CPU ms consumed so far by ``root_pid`` and every live
    descendant (python workers included). Monotone across calls."""
    scan = _scan_procs()
    if scan is None:
        return None
    procs, children = scan
    ticks = sum(procs[p][1] for p in _tree(root_pid, procs, children))
    return int(ticks * 1000 / _CLK_TCK)


def spark_cpu_ms(spark) -> int | None:
    """CPU ms of the whole Spark runtime — python driver (manifest/
    metadata work happens THERE), JVM executor threads, and python UDF
    workers — or None when unmeasurable (no /proc, no py4j). The two
    roots cover both launch topologies: pyspark-shell (JVM is a child
    of the python driver) and spark-submit (python is a child of the
    JVM); the union dedupes whichever nesting holds."""
    scan = _scan_procs()
    if scan is None:
        return None
    procs, children = scan
    pids = _tree(os.getpid(), procs, children)
    jp = jvm_pid(spark)
    if jp is not None:
        pids |= _tree(jp, procs, children)
    ticks = sum(procs[p][1] for p in pids)
    return int(ticks * 1000 / _CLK_TCK)
