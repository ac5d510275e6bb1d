#!/usr/bin/env python
"""Strip the optimizer state from a checkpoint (reference:
tools/remove_solver_states.py) — produces a weights-only checkpoint for
distribution.

Usage: python tools/remove_solver_states.py --in ckpt_dir/model_final --out slim/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in", dest="inp", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    data = ckptr.restore(os.path.abspath(args.inp))
    slim = {"step": data["step"], "params": data["params"],
            "constants": data["constants"], "opt_state": {}}
    out = os.path.abspath(args.out)
    ckptr.save(out, slim, force=True)
    print(f"wrote weights-only checkpoint to {out}")


if __name__ == "__main__":
    main()
