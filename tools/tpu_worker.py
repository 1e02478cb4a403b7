"""Persistent TPU job runner (development tool).

Holds the TPU claim once and executes job scripts dropped at
/tmp/tpu_job.py, writing output to /tmp/tpu_job.out (then renaming the job
to /tmp/tpu_job.done). Jobs share one globals dict, so expensive state
(graphs, compiled fns) persists between jobs. Avoids the multi-minute
chip-claim stall that a fresh process pays.
"""

import io
import os
import sys
import time
import traceback

JOB = "/tmp/tpu_job.py"
OUT = "/tmp/tpu_job.out"
DONE = "/tmp/tpu_job.done"

os.makedirs("/root/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("worker: claiming device...", flush=True)
t0 = time.time()
print("worker: devices:", jax.devices(), f"({time.time()-t0:.1f}s)", flush=True)

G = {"__name__": "__tpu_job__"}

while True:
    if not os.path.exists(JOB):
        time.sleep(0.5)
        continue
    with open(JOB) as f:
        src = f.read()
    buf = io.StringIO()
    old = sys.stdout
    t0 = time.time()
    try:
        sys.stdout = buf
        exec(compile(src, JOB, "exec"), G)
        status = "OK"
    except Exception:
        traceback.print_exc(file=buf)
        status = "ERROR"
    finally:
        sys.stdout = old
    buf.write(f"\n[{status} in {time.time()-t0:.1f}s]\n")
    with open(OUT + ".tmp", "w") as f:
        f.write(buf.getvalue())
    os.replace(OUT + ".tmp", OUT)
    os.replace(JOB, DONE)
    print(f"worker: job {status} ({time.time()-t0:.1f}s)", flush=True)
