"""Round-15 committed A/B for the round-14 session defaults (VERDICT
r14 item 3): BLAS pin on/off x {8, 32} cores on the lanes the pin is
supposed to protect (media tier + the two BLAS-adjacent fx lanes).
Each arm is a fresh bench.py subprocess (the pin is session-level), so
arms alternate pin values at each core count to interleave against
host steal waves; every arm's env block (incl. steal) ships in the
artifact. Writes plans/r15/BLAS_PIN_AB.json.

Usage: python scripts/ab_blas_pin.py [rounds_per_arm]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LANES = ("media_jpeg_decode,media_resize,media_wav_features,"
         "media_video_frames,fx_corr_user_buckets,fx_imbalance_bars")


def run_arm(cpus: int, pin: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=os.environ.get(
                   "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_WORKER_BLAS_PIN=pin,
               SPARK_GRAFT_QUERIES=LANES,
               SPARK_GRAFT_TRIALS="5")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    detail = json.loads(lines[0])["queries_detail"]
    summary = json.loads(lines[-1])
    return {"cpus": cpus, "pin": pin, "ts": round(time.time(), 1),
            "queries": summary["queries"],
            "mins": {k: v["min"] for k, v in detail.items()},
            "steal_sec": {k: v["steal_sec"] for k, v in detail.items()},
            "env": summary["env"]}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    arms = []
    for _ in range(rounds):
        for cpus in (32, 8):
            for pin in ("1", "0"):
                arm = run_arm(cpus, pin)
                arms.append(arm)
                print(json.dumps(arm), flush=True)
    path = os.path.join(REPO, "plans", "r15", "BLAS_PIN_AB.json")
    with open(path, "w") as f:
        json.dump({"lanes": LANES.split(","), "arms": arms}, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
