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
        evm = {int(em[1][0]): str(em[2][0].get(2, ["?"])[0])
               for em in p.get(4, []) if isinstance(em, dict)}
        for line_ in p.get(3, []):  # XPlane.lines
            lname = line_.get(2, [""])[0]
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
    a = ap.parse_args()
    report(a.trace_dir, a.top)
