"""Train just the acting+stabilizing policy pair for one task (the protocol
eval's training legs, nothing else) — so the open-loop probe
(tools/probe_policy_open_loop.py) can interrogate the weights BEFORE spending
chip time on the 3-stage eval protocol.

Run:  python tools/train_pair.py --task open_drawer --out eval_artifacts \
          --iters 6000 --save-freq 2000 --platform tpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__) or ".")

import jax  # noqa: E402

_plat = "cpu"
for _i, _tok in enumerate(sys.argv):
    if _tok == "--platform" and _i + 1 < len(sys.argv):
        _plat = sys.argv[_i + 1]
    elif _tok.startswith("--platform="):
        _plat = _tok.split("=", 1)[1]
if _plat == "cpu":
    jax.config.update("jax_platforms", _plat)
jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")

from run_protocol_eval import COMMON, train_policy  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True)
    ap.add_argument("--out", default="eval_artifacts")
    ap.add_argument("--iters", type=int, default=6000)
    ap.add_argument("--save-freq", type=int, default=2000)
    ap.add_argument("--demos", type=int, default=10)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--extra", nargs="*", default=[])
    args = ap.parse_args()
    COMMON.extend(args.extra)
    root = os.path.join(args.out, args.task)
    os.makedirs(root, exist_ok=True)
    for arm in ("dominant", "assistive"):
        train_policy(args.task, arm, root, args.iters, args.demos,
                     args.save_freq)


if __name__ == "__main__":
    main()
