#!/usr/bin/env python
"""Deliberately-loaded-window measurement (VERDICT r16 #1 'done' criteria):
spawn N busy-loop processes, run the isolate harness on the named queries,
then kill the spinners by PID. Usage:
    python plans/r17/loadtest.py --spin 16 q17_triangles q23b_embedding_near_dup
"""
import os
import signal
import subprocess
import sys

SPIN_SRC = "while True:\n    pass\n"


def main() -> None:
    args = sys.argv[1:]
    nspin = 16
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--spin":
            nspin = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    spinners = [
        subprocess.Popen([sys.executable, "-c", SPIN_SRC])
        for _ in range(nspin)
    ]
    print(f"spinners: {nspin} pids={[p.pid for p in spinners]}", flush=True)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        subprocess.run(
            [sys.executable, os.path.join(here, "isolate.py"), *names,
             "--runs", "4"],
            check=False,
        )
    finally:
        for p in spinners:
            try:
                p.send_signal(signal.SIGKILL)
            except OSError:
                pass
        for p in spinners:
            p.wait()
        print("spinners killed", flush=True)


if __name__ == "__main__":
    main()
