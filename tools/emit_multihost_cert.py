"""Emit the per-round multi-host certificate (r4 verdict ask 7).

Runs ``__graft_entry__.dryrun_multihost(2, 4)`` — a REAL 2-process gloo
pod of 4 virtual CPU devices each, exercising ``jax.distributed`` init,
process-sliced loaders and the sharded train step over the global mesh —
and writes ``MULTIHOST_r{N}.json`` ({ok, rc, tail}) next to the BENCH/
MULTICHIP artifacts so the pod path has driver-level evidence every round.

    python tools/emit_multihost_cert.py [round_number]
"""
from __future__ import annotations

import io
import json
import os
import sys
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    round_no = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, f"MULTIHOST_r{round_no:02d}.json")
    buf = io.StringIO()
    ok, rc = True, 0
    try:
        from __graft_entry__ import dryrun_multihost
        with redirect_stdout(buf):
            dryrun_multihost(2, 4)
    except BaseException as e:  # noqa: BLE001 — certificate must record it
        ok, rc = False, 1
        buf.write(f"\n{type(e).__name__}: {e}\n")
        buf.write(traceback.format_exc()[-2000:])
    tail = buf.getvalue()[-4000:]
    with open(out_path, "w") as f:
        json.dump({"ok": ok, "rc": rc, "cmd": "dryrun_multihost(2, 4)",
                   "tail": tail}, f, indent=1)
    print(f"wrote {out_path}: ok={ok}")
    sys.exit(rc)


if __name__ == "__main__":
    main()
