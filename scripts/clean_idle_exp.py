"""Delete stale experiment dirs (reference scripts/clean_idle_exp.py:1-34).

An experiment is idle when its evaluations/ dir is empty and it holds
few checkpoints. Prompts before deleting unless --yes.
"""

import argparse
import os
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="exp")
    p.add_argument("--max-ckpts", type=int, default=3)
    p.add_argument("--yes", action="store_true")
    args = p.parse_args()

    if not os.path.isdir(args.root):
        print(f"no {args.root}/ directory")
        return
    victims = []
    for name in sorted(os.listdir(args.root)):
        path = os.path.join(args.root, name)
        if not os.path.isdir(path):
            continue
        evals = os.path.join(path, "evaluations")
        ckpts = os.path.join(path, "checkpoints")
        n_eval = len(os.listdir(evals)) if os.path.isdir(evals) else 0
        n_ckpt = len(os.listdir(ckpts)) if os.path.isdir(ckpts) else 0
        if n_eval == 0 and n_ckpt <= args.max_ckpts:
            victims.append(path)
    if not victims:
        print("nothing to clean")
        return
    print("will delete:")
    for v in victims:
        print(" ", v)
    if not args.yes:
        if input("confirm [y/N]? ").strip().lower() != "y":
            return
    for v in victims:
        shutil.rmtree(v)
        print("deleted", v)


if __name__ == "__main__":
    main()
