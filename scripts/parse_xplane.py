"""Kernel-level report from a ``jax.profiler.trace`` xplane dump.

The tunneled-TPU image ships no xplane python bindings (tensorboard's
converter is ABI-broken against the installed protobuf), but ``protoc`` is
available — so this decodes the raw protobuf wire format via
``protoc --decode_raw`` and aggregates per-op device time from the TPU
plane's "XLA Ops" line.  This is how the 104k-examples/sec CX step was
tuned: the f32 answer head and the per-step table staging were both found
with this report (see PARITY.md round-2 status).

Usage:
    python - <<'PY'
    import jax
    with jax.profiler.trace("/tmp/jaxtrace"):
        ...  # steps to profile
    PY
    python scripts/parse_xplane.py /tmp/jaxtrace [--top 30]
"""

import argparse
import collections
import glob
import os
import re
import subprocess
import sys


def decode_raw(pb_path: str) -> str:
    return subprocess.run(["protoc", "--decode_raw"],
                          stdin=open(pb_path, "rb"), capture_output=True,
                          text=True, check=True).stdout


def parse_block(lines, i, indent):
    """Parse protoc --decode_raw output: nested ``N {`` blocks, ``N: v`` leaves.

    Returns ({field_number: [values]}, next_line_index); values are nested
    dicts or raw strings.
    """
    out = collections.defaultdict(list)
    while i < len(lines):
        stripped = lines[i].strip()
        if stripped == "}":
            return out, i + 1
        m = re.match(r"(\d+) \{$", stripped)
        if m:
            sub, i = parse_block(lines, i + 1, indent + 1)
            out[int(m.group(1))].append(sub)
            continue
        m = re.match(r"(\d+): (.*)$", stripped)
        if m:
            out[int(m.group(1))].append(m.group(2))
            i += 1
            continue
        i += 1
    return out, i


def _first(d, key):
    """First repeated-field value of a parse_block dict, or None.

    parse_block yields defaultdict(list); absent fields are empty lists,
    so ``d[key][0]`` is not safe without this presence check."""
    if not isinstance(d, dict):
        return None
    v = d.get(key)
    return v[0] if v else None


def planes_from_text(text: str):
    lines = text.splitlines()
    i, planes = 0, []
    while i < len(lines):
        if lines[i] == "1 {":  # XSpace.planes
            p, i = parse_block(lines, i + 1, 1)
            planes.append(p)
        else:
            i += 1
    return planes


def _tpu_plane_tables(plane):
    """(stat_name->id, metadata_id->(op_name, hbm_bytes, all_bytes)) maps.

    ``hbm_bytes`` sums the profiler's ``memory_access_breakdown`` entries
    attributed to memory space 1 (HBM); ``all_bytes`` is the op's
    ``bytes_accessed`` (every space).  Both are per-OCCURRENCE counts
    attached to the op metadata of the compiled executable's fusions —
    at fusion granularity operands+outputs ARE the op's HBM traffic
    (intermediates live in VMEM/registers), so summing them over the
    actually-executed event stream measures the program's HBM traffic,
    unlike HLO-level cost analysis which ignores fusion reuse.
    """
    statm = {}
    for sm in plane.get(5, []):  # XPlane.stat_metadata
        # parse_block returns defaultdicts: a metadata entry serialized
        # without a value field makes sm[2] an empty list, so index only
        # after checking presence (sm[2][0] on it raises IndexError)
        val = _first(sm, 2)
        sid = _first(sm, 1)
        if isinstance(val, dict) and sid is not None:
            sname = _first(val, 2)
            if isinstance(sname, str):
                statm[int(sid)] = sname.strip('"')
    inv = {v: k for k, v in statm.items()}
    ba_id, mab_id = inv.get("bytes_accessed"), inv.get(
        "memory_access_breakdown")
    md = {}
    for em in plane.get(4, []):  # XPlane.event_metadata
        m = _first(em, 2)
        if not isinstance(m, dict) or _first(m, 1) is None:
            continue
        mid = int(m[1][0])
        raw_name = _first(m, 2)
        # field 2 can hold a nested stats block instead of the name string
        # (stats-only metadata): str() of that parse dict is garbage — fall
        # back to a stable id-derived label
        name = (str(raw_name).strip('"')
                if isinstance(raw_name, str) else "op_%d" % mid)
        all_bytes = hbm_bytes = 0
        for s in m.get(5, []):  # XEventMetadata.stats
            if not isinstance(s, dict):
                continue
            sid = int(s[1][0])
            if sid == ba_id and 4 in s:  # XStat.int64_value
                all_bytes = int(s[4][0])
            elif sid == mab_id and 6 in s:
                for entry in s[6]:
                    if not isinstance(entry, dict):
                        continue
                    for e2 in entry.get(1, []):
                        if (isinstance(e2, dict)
                                and int(e2.get(1, [0])[0]) == 1):  # HBM
                            hbm_bytes += int(e2.get(3, [0])[0])
        md[mid] = (name, hbm_bytes, all_bytes)
    return statm, md


def hbm_summary(trace_dir: str, n_steps: int, top: int = 8) -> dict:
    """Measured per-step HBM traffic of a traced window (VERDICT r3 #3).

    Sums the profiler's HBM-space byte attribution over every op event the
    TPU actually executed in the trace (TensorCore fusions + async DMA
    streams), divided by ``n_steps``.  ``*-done`` async ops are skipped:
    the matching ``*-start`` op already carries the transfer's bytes, so
    counting both would double the async traffic.  Multiplying
    ``hbm_bytes_per_step`` by a wall-clock steps/sec gives the achieved
    HBM bandwidth — a MEASURED number (executed-fusion granularity), not
    the no-reuse HLO upper bound ``bytes accessed`` reports.
    """
    pbs = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                 "*.xplane.pb"))
    if not pbs:
        raise FileNotFoundError("no *.xplane.pb under %s" % trace_dir)
    planes = planes_from_text(decode_raw(sorted(pbs)[-1]))
    out = {"n_steps": n_steps, "tc_busy_ms_per_step": 0.0,
           "dma_busy_ms_per_step": 0.0, "hbm_bytes_per_step": 0.0,
           "hbm_bytes_per_step_tc": 0.0, "hbm_bytes_per_step_dma": 0.0,
           "top_ops": []}
    name_re = re.compile(r"^%?([\w.\-]+) =")
    # container ops (scan/while bodies, calls) WRAP their body ops on the
    # same line: counting them would double both busy time and any bytes —
    # the body fusions already account for the real work
    container_re = re.compile(r"^(while|call|conditional|async-region)")
    per_op = collections.defaultdict(lambda: [0.0, 0, 0])  # ms, count, bytes
    for p in planes:
        if "TPU" not in str(p.get(2, ["?"])[0]):
            continue
        _, md = _tpu_plane_tables(p)
        for line_ in p.get(3, []):
            lraw = _first(line_, 2)
            lname = lraw if isinstance(lraw, str) else ""
            if "Steps" in lname or "Module" in lname:
                continue  # step/module envelopes: no op-level bytes
            is_tc = "XLA Ops" in lname
            line_ms = line_bytes = 0.0
            for ev in line_.get(4, []):
                if not isinstance(ev, dict):
                    continue
                mid = int(ev.get(1, [0])[0])
                dur_ms = int(ev.get(3, [0])[0]) / 1e9
                name, hbm_bytes, _ = md.get(mid, ("?", 0, 0))
                m = name_re.match(name)
                short = m.group(1) if m else name[:40]
                if container_re.match(short):
                    continue
                if short.endswith("-done") or ".-done" in short:
                    hbm_bytes = 0  # counted at the matching *-start
                line_ms += dur_ms
                line_bytes += hbm_bytes
                rec = per_op[short]
                rec[0] += dur_ms
                rec[1] += 1
                rec[2] += hbm_bytes
            if is_tc:
                out["tc_busy_ms_per_step"] += line_ms / n_steps
                out["hbm_bytes_per_step_tc"] += line_bytes / n_steps
            else:
                out["dma_busy_ms_per_step"] += line_ms / n_steps
                out["hbm_bytes_per_step_dma"] += line_bytes / n_steps
            out["hbm_bytes_per_step"] += line_bytes / n_steps
    ranked = sorted(per_op.items(), key=lambda kv: -kv[1][2])[:top]
    out["top_ops"] = [
        {"op": nm, "ms_per_step": round(ms / n_steps, 4),
         "hbm_mb_per_step": round(b / n_steps / 1e6, 2),
         "achieved_gbps": round(b / 1e9 / (ms / 1e3), 1) if ms else None}
        for nm, (ms, cnt, b) in ranked if b]
    for k in ("tc_busy_ms_per_step", "dma_busy_ms_per_step"):
        out[k] = round(out[k], 4)
    return out


def report(trace_dir: str, top: int = 30):
    pbs = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                 "*.xplane.pb"))
    if not pbs:
        sys.exit("no *.xplane.pb under %s" % trace_dir)
    planes = planes_from_text(decode_raw(sorted(pbs)[-1]))
    for p in planes:
        name = p.get(2, ["?"])[0]  # XPlane.name
        if "TPU" not in name:
            continue
        # XPlane.event_metadata: map<id, XEventMetadata{id=1, name=2}>
        # some entries carry a nested block where the name string should be
        # (e.g. stats-only metadata) — coerce to str so the report survives
        evm = {}
        for em in p.get(4, []):
            key, val = _first(em, 1), _first(em, 2)
            if key is not None and isinstance(val, dict):
                vname = _first(val, 2)
                evm[int(key)] = (vname if isinstance(vname, str)
                                 else "op_%s" % key)
        for line_ in p.get(3, []):  # XPlane.lines
            lraw = _first(line_, 2)
            lname = lraw if isinstance(lraw, str) else ""
            totals, counts = collections.Counter(), collections.Counter()
            for ev in line_.get(4, []):  # XLine.events
                if not isinstance(ev, dict):
                    continue
                mid = int(ev.get(1, [0])[0])        # XEvent.metadata_id
                dur_ms = int(ev.get(3, [0])[0]) / 1e9   # duration_ps
                nm = str(evm.get(mid, mid)).strip('"')
                totals[nm] += dur_ms
                counts[nm] += 1
            if not totals:
                continue
            print("== plane %s line %s: %d events, %.2f ms total"
                  % (name, lname, sum(counts.values()),
                     sum(totals.values())))
            for nm, ms in totals.most_common(top):
                print("  %9.3f ms x%-5d %s" % (ms, counts[nm], nm[:100]))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--hbm_steps", type=int, default=0,
                    help="if >0, print the measured HBM-traffic summary "
                         "for a trace of this many steps instead of the "
                         "per-op time report")
    a = ap.parse_args()
    if a.hbm_steps:
        import json

        print(json.dumps(hbm_summary(a.trace_dir, a.hbm_steps, a.top),
                         indent=2))
    else:
        report(a.trace_dir, a.top)
