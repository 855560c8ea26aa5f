#!/usr/bin/env python3
"""Copy measurement JSON lines from tpu_queue.sh logs into the committed
artifacts (run after `bash scripts/tpu_queue.sh` completes).

    python scripts/refresh_artifacts.py [logdir]

bigmap -> BENCH_BIGMAP.jsonl and roofline -> BENCH_ROOFLINE.jsonl are
full refreshes (the artifact describes one coherent measurement session);
tunroll -> BENCH_TUNROLL.jsonl is written verbatim for the
DEFAULT_T_UNROLL_* / DEFAULT_BAND_UNROLL decision (made manually, with
the winning numbers recorded next to the constants).  Prints a summary;
does NOT git-commit.
"""

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAP = {
    "q_bigmap.log": "BENCH_BIGMAP.jsonl",
    "q_roofline.log": "BENCH_ROOFLINE.jsonl",
    "q_tunroll.log": "BENCH_TUNROLL.jsonl",
    "q_models.log": "BENCH_MODELS.jsonl",
    "q_serve.log": "BENCH_SERVE.jsonl",
}


def json_lines(path):
    out = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{"):
                try:
                    json.loads(line)
                except ValueError:
                    continue
                out.append(line)
    return out


def append_parity(logdir):
    """Record the on-device parity run (q_parity.log) in PARITY.md: a dated,
    commit-stamped section with the verbatim OK/FAIL lines — the evidence
    VERDICT r3 item 1 requires next to the kernel-routing claims."""
    src = os.path.join(logdir, "q_parity.log")
    if not os.path.exists(src):
        print("skip PARITY.md: no q_parity.log")
        return
    lines = [l.rstrip() for l in open(src)
             if l.startswith(("OK ", "OK~", "FAIL", "all cases pass"))]
    if not lines:
        print("skip PARITY.md: q_parity.log has no OK/FAIL lines")
        return
    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                         capture_output=True, text=True).stdout.strip()
    date = datetime.date.today().isoformat()
    n_fail = sum(1 for l in lines if l.startswith("FAIL"))
    verdict = "ALL PASS" if n_fail == 0 else f"{n_fail} FAILURES"
    block = (f"\n### {date} @ {sha} — {verdict}\n\n```\n"
             + "\n".join(lines) + "\n```\n")
    dst = os.path.join(REPO, "PARITY.md")
    text = open(dst).read()
    header = "## On-device parity runs (real TPU)"
    if header not in text:
        text += f"\n{header}\n\nPallas-vs-XLA max relative cost error per " \
                "kernel layout (`scripts/tpu_parity_check.py`).\n"
    with open(dst, "w") as fh:
        fh.write(text + block)
    print(f"appended PARITY.md: {len(lines)} lines, {verdict}")


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    for log, artifact in MAP.items():
        src = os.path.join(logdir, log)
        if not os.path.exists(src):
            print(f"skip {artifact}: no {src}")
            continue
        lines = json_lines(src)
        if not lines:
            print(f"skip {artifact}: {src} has no JSON lines")
            continue
        dst = os.path.join(REPO, artifact)
        with open(dst, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"wrote {artifact}: {len(lines)} rows")
    append_parity(logdir)


if __name__ == "__main__":
    main()
