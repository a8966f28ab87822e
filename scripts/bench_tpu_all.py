"""One-process TPU measurement session: tile-sweep bench then big SVD++.

The axon device wedges when touched by overlapping or repeated short
processes, so all pending measurements run inside ONE process back to
back (each sub-script begins with its own tiny-matmul health probe).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python scripts/bench_tpu_all.py
"""

import pathlib
import runpy
import sys

HERE = pathlib.Path(__file__).parent
for name in ("bench_sweep.py", "bench_svdpp_big.py"):
    print(f"==== {name} ====", flush=True)
    try:
        runpy.run_path(str(HERE / name), run_name="__main__")
    except SystemExit:
        pass
    except Exception as e:  # noqa: BLE001
        print(f"FAILED {name}: {type(e).__name__}: {e}", file=sys.stderr, flush=True)
        break  # a wedged device will also break the next script; stop
