"""Probe whether the axon TPU tunnel is reachable (exit 0) or down (exit 1).

The axon PJRT plugin blocks indefinitely inside make_c_api_client when the
tunnel is down, so the probe runs the device query in a subprocess and kills
it after --timeout seconds. Cheap enough to poll between work items.
"""
import argparse
import subprocess
import sys

CODE = "import jax; print(jax.devices())"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=45.0)
    args = ap.parse_args()
    try:
        r = subprocess.run(
            [sys.executable, "-c", CODE], timeout=args.timeout,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print("tunnel DOWN (device init timed out)")
        return 1
    if r.returncode == 0 and "axon" in r.stdout.lower():
        print("tunnel UP:", r.stdout.strip().splitlines()[-1])
        return 0
    print("tunnel DOWN (rc=%d): %s" % (r.returncode, r.stderr.strip()[-200:]))
    return 1


if __name__ == "__main__":
    sys.exit(main())
