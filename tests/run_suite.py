"""Crash-resilient suite runner: the full test suite as a few sequential
pytest processes (4 files per process).

Why: on small hosts (observed on a 1-core CI box), XLA:CPU sporadically
segfaults/aborts deep inside executable compilation or (de)serialization
once a single process has compiled several hundred programs — reproduced
on an UNMODIFIED older revision of this repo, so it is environmental, not
a library regression (the same monolithic run is green on larger hosts).
A crashed pytest process takes every not-yet-run test with it; bounding
each process to a handful of files keeps the per-process compile count far
below the observed failure horizon and contains any crash to one batch.

All batches share the persistent compilation cache (tests/conftest.py), so
the total wall time matches the monolithic run after the first pass.

Usage:  python tests/run_suite.py [--quick] [extra pytest args...]
        --quick additionally skips the subprocess examples, fuzz loops and
        full reference-parity sweeps (the inner-loop tier; `make test-quick`)
Exit code: 0 iff every batch passed.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

BATCH_SIZE = 4
# Opt-in / special files that are not part of the default sweep
EXCLUDE = {"test_examples.py", "test_tpu_live.py"}
QUICK_EXCLUDE = EXCLUDE | {"test_fuzz.py", "test_reference_parity.py"}


def main(argv):
    argv = list(argv)
    exclude = EXCLUDE
    if "--quick" in argv:
        argv.remove("--quick")
        exclude = QUICK_EXCLUDE
    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(
        f for f in glob.glob(os.path.join(here, "test_*.py"))
        if os.path.basename(f) not in exclude
    )
    batches = [files[i:i + BATCH_SIZE] for i in range(0, len(files), BATCH_SIZE)]
    failures = []
    t0 = time.time()
    for i, batch in enumerate(batches):
        names = ", ".join(os.path.basename(b) for b in batch)
        print(f"[suite {i + 1}/{len(batches)}] {names}", flush=True)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *batch, *argv],
            cwd=os.path.dirname(here),
        )
        if r.returncode != 0:
            failures.append((names, r.returncode))
    dt = time.time() - t0
    if failures:
        print(f"\nsuite FAILED in {dt:.0f}s; failing batches:")
        for names, rc in failures:
            print(f"  rc={rc}: {names}")
        return 1
    print(f"\nsuite OK in {dt:.0f}s ({len(files)} files, {len(batches)} processes)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
