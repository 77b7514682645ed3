"""Run the full 19-config CX ablation grid (reference options/cx/*.yaml)
end-to-end through the real CLI on synthetic data and emit the ABLATIONS.md
table rows.

Protocol (recorded in the table header): 3 epochs, batch 256, 2048 synthetic
train examples, seed 42, lr/bs from each config unless the config omits them.
Per row the exact command is:

    python -m vqa_counterexamples_tpu.cli.counterexamples \
        --path_opt configs/cx/<config>.yaml --epochs 3 \
        --synthetic 2048 --batch_size 256 --seed 42

Usage: python scripts/run_ablations.py [--cpu] [--configs a,b,...]
Writes one JSON line per config to stdout and a markdown table to
/tmp/ablations_rows.md.
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cfg_path: str, cpu: bool) -> dict:
    name = os.path.splitext(os.path.basename(cfg_path))[0]
    cli_args = ["--cx_model", "NeuralModel",
                "--path_opt", cfg_path, "--epochs", "3",
                "--synthetic", "2048", "--batch_size", "256", "--seed", "42",
                "--project_dir", "/tmp/ablations_r2"]
    if cpu:
        # the session's sitecustomize registers the TPU plugin at interpreter
        # start, so JAX_PLATFORMS=cpu env alone is too late — force through
        # jax.config before the CLI imports anything jax-touching
        code = ("import jax; jax.config.update('jax_platforms','cpu'); "
                "from vqa_counterexamples_tpu.cli.counterexamples import "
                "main; main(%r)" % (cli_args,))
        cmd = [sys.executable, "-c", code]
    else:
        cmd = [sys.executable, "-m",
               "vqa_counterexamples_tpu.cli.counterexamples"] + cli_args
    env = dict(os.environ)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                          env=env, timeout=3600)
    out = proc.stdout
    row = {"config": name, "rc": proc.returncode,
           "wall_s": round(time.time() - t0, 1)}
    # last epoch's val line: "Epoch 3 val: {'loss': ..., 'recall': ...}"
    matches = re.findall(r"Epoch \d+ val: ({.*})", out)
    if matches:
        # our own printed dict; nan/inf names appear when a config diverges
        vals = eval(matches[-1],  # noqa: S307
                    {"nan": float("nan"), "inf": float("inf")})
        row.update(loss=round(vals.get("loss", float("nan")), 4),
                   recall5=round(vals.get("recall", float("nan")), 4),
                   recall1=round(vals.get("recall_1", float("nan")), 4))
    else:
        row["tail"] = (proc.stderr or out)[-800:]
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--configs", type=str, default=None,
                    help="comma-separated config names (default: all 19)")
    args = ap.parse_args()

    if args.configs:
        cfgs = [os.path.join(REPO, "configs", "cx", c + ".yaml")
                for c in args.configs.split(",")]
    else:
        cfgs = sorted(glob.glob(os.path.join(REPO, "configs", "cx",
                                             "*.yaml")))
    rows = []
    for cfg in cfgs:
        row = run_one(cfg, args.cpu)
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("/tmp/ablations_rows.md", "w") as f:
        f.write("| config | val loss | recall@5 | recall@1 |\n")
        f.write("|---|---|---|---|\n")
        for r in rows:
            if r["rc"] == 0 and "loss" in r:
                f.write("| %s | %.4f | %.4f | %.4f |\n"
                        % (r["config"], r["loss"], r["recall5"],
                           r["recall1"]))
            else:
                f.write("| %s | FAILED rc=%d | | |\n"
                        % (r["config"], r["rc"]))
    print("table written to /tmp/ablations_rows.md", flush=True)


if __name__ == "__main__":
    main()
