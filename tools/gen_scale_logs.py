#!/usr/bin/env python
"""Generate a deterministic large templated log file for induction/parse
scaling runs (hash-deterministic like gen_scale_docs — no RNG state).

    python tools/gen_scale_logs.py --out /tmp/lad_logs2m.log --n-lines 2000000

Shape: HDFS-style lines over N_TEMPLATES fixed message templates with
hash-derived parameters — log-LIKE data (every line matches a founded
template), so induction exercises the match-join fixpoint rather than the
bulk-founding fallback for template-free text.
"""

from __future__ import annotations

import argparse
import hashlib


def _h(i: int, salt: str) -> int:
    return int.from_bytes(
        hashlib.md5(f"{salt}:{i}".encode()).digest()[:6], "big"
    )


TEMPLATES = [
    "Receiving block blk_{p} src /10.0.{q}.{r} dest /10.0.0.9",
    "PacketResponder {q} for block blk_{p} terminating",
    "Verification succeeded for blk_{p}",
    "Deleting block blk_{p} file /data/part-{q}",
    "BLOCK NameSystem allocateBlock /user/job_{q}/part-{r} blk_{p}",
    "Served block blk_{p} to /10.0.{q}.{r}",
    "Exception in receiveBlock for block blk_{p} java.io.IOException",
    "Starting thread to transfer block blk_{p} to /10.0.{q}.{r}",
    "Received block blk_{p} of size {r} from /10.0.{q}.1",
    "writeBlock blk_{p} received exception java.io.EOFException",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-lines", type=int, default=2_000_000)
    args = ap.parse_args()
    with open(args.out, "w") as f:
        for i in range(args.n_lines):
            t = TEMPLATES[i % len(TEMPLATES)]
            body = t.format(
                p=_h(i, "p") % 10_000_000,
                q=_h(i, "q") % 250,
                r=_h(i, "r") % 100_000,
            )
            pre = f"081109 {203500 + i % 400} {i % 100} INFO dfs.DataNode$PacketResponder:"
            f.write(pre + " " + body + "\n")
    print(f"wrote {args.out} ({args.n_lines} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
