#!/usr/bin/env python
"""Multi-chip dryrun sweep: n in {8, 16, 32} virtual devices (VERDICT r4
item 7).  Each count needs its own process — XLA reads
xla_force_host_platform_device_count once at backend creation — so this
driver spawns `python __graft_entry__.py N` per count and records the
results in out_configs/multichip_ext.json.

Run: timeout 1800 python -u scripts/run_multichip.py
"""
import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
COUNTS = (8, 16, 32)


def main():
    results = {}
    for n in COUNTS:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-u", str(ROOT / "__graft_entry__.py"), str(n)],
            cwd=ROOT, capture_output=True, text=True, timeout=1500)
        out = proc.stdout.strip().splitlines()
        ok = proc.returncode == 0 and any("ok" in ln for ln in out)
        results[n] = {
            "ok": ok,
            "seconds": round(time.time() - t0, 1),
            "tail": out[-2:] if out else proc.stderr.strip().splitlines()[-3:],
        }
        print(f"n={n}: {'OK' if ok else 'FAIL'} "
              f"({results[n]['seconds']}s) {results[n]['tail']}", flush=True)
    path = ROOT / "out_configs" / "multichip_ext.json"
    path.write_text(json.dumps(results, indent=1))
    print(f"wrote {path}")
    if not all(r["ok"] for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
