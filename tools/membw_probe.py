"""Control experiment for the scaling ceiling: plain multiprocessing
(no Ray) running identical string/regex work per process. If N procs
take longer than 1 proc for the same per-proc work, the HARDWARE
(memory bandwidth) is the limiter, not the engine.

Observed on the bench box (32-core Xeon VM, 2026-08-17):
  pure-arithmetic work : 1→32 procs, 0.36s→0.51s  (≈90% eff at 32)
  regex/string work    : 1→8→32,    0.39s→0.41s→0.71s
                         → hardware aggregate ceiling 8→32 ≈ 0.58
"""

import multiprocessing as mp
import re
import time


def arith(_):
    s = 0
    for i in range(4_000_000):
        s += i * i % 7
    return s


def regex(_):
    data = (
        'level=info ts=2026-01-01T00:00:07Z tool=bash status=ok msg="ran 3 commands"\n'
        * 1_000_000
    )
    rx = re.compile(r'level=(.*?) ts=(.*?) tool=(.*?) status=(.*?) msg="(.*?)"')
    return sum(1 for _ in rx.finditer(data[:20_000_000]))


if __name__ == "__main__":
    for name, fn in (("arith", arith), ("regex", regex)):
        for n in (1, 4, 8, 16, 32):
            with mp.Pool(n) as p:
                t0 = time.time()
                p.map(fn, range(n))
                print(f"{name:6s} {n:2d} procs x fixed work: {time.time()-t0:.2f}s")
