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

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAP = {
    "q_bigmap.log": "BENCH_BIGMAP.jsonl",
    "q_roofline.log": "BENCH_ROOFLINE.jsonl",
    "q_tunroll.log": "BENCH_TUNROLL.jsonl",
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


if __name__ == "__main__":
    main()
