"""Persistent TPU job worker (development harness, not part of the library).

The tunneled single-chip TPU in this environment wedges new client attaches
for several minutes after a clean client exit, so iterative development is
run through ONE long-lived process: this worker polls a queue directory for
``*.py`` snippets, executes them in a shared namespace (so compiled jits and
loaded instances persist across jobs), and writes each job's stdout/stderr +
traceback to ``<job>.out`` next to it, renaming the job to ``<job>.done``.

Usage:
    python tools/tpu_worker.py /tmp/tpuq &
    echo 'print(1+1)' > /tmp/tpuq/job1.py   # result in /tmp/tpuq/job1.out
"""

from __future__ import annotations

import io
import os
import sys
import time
import traceback


def main(qdir):
    os.makedirs(qdir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ns = {"__name__": "__tpu_worker__"}
    print(f"worker ready, polling {qdir}", flush=True)
    while True:
        jobs = sorted(
            f for f in os.listdir(qdir)
            if f.endswith(".py") and not f.startswith("_")
        )
        if not jobs:
            time.sleep(0.3)
            continue
        job = jobs[0]
        path = os.path.join(qdir, job)
        with open(path) as f:
            src = f.read()
        buf = io.StringIO()
        old_out, old_err = sys.stdout, sys.stderr
        t0 = time.time()
        try:
            sys.stdout = sys.stderr = buf
            exec(compile(src, job, "exec"), ns)
            status = "OK"
        except BaseException:
            traceback.print_exc()
            status = "FAIL"
        finally:
            sys.stdout, sys.stderr = old_out, old_err
        wall = time.time() - t0
        with open(path + ".out", "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n== {status} in {wall:.1f}s ==\n")
        os.rename(path, path + ".done")
        print(f"{job}: {status} in {wall:.1f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuq")
