"""Migrate a reference PyTorch checkpoint to TPU and back.

1. Convert a reference ``best_model.pth`` into a framework checkpoint dir
   (model weights + BN stats; the sidecar is flagged model_only so training
   resumes with a fresh optimizer).
2. Continue training it.
3. Export the result back to a reference-schema ``.pth`` that the
   reference's ``load_vqa_model`` loads with ``strict=True``.

Usage:
    python examples/migrate_from_pytorch.py --pth best_model.pth \
        [--out-dir /tmp/migrated] [--epochs 2]

Without ``--pth`` the script fabricates a reference-schema .pth from a
freshly initialized tiny model first, so it runs self-contained.
"""

import argparse
import os
import subprocess
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", default=None, help="reference .pth checkpoint")
    p.add_argument("--out-dir", default="/tmp/vqa_migrated")
    p.add_argument("--epochs", type=int, default=2)
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    pth = args.pth
    # --tiny must match the imported checkpoint's architecture: a real
    # reference .pth is full-size, the fabricated self-contained one is tiny
    tiny = pth is None
    if pth is None:
        # self-contained mode: fabricate a reference-schema .pth
        import jax

        from vqa_tpu.compat.torch_export import save_torch_checkpoint
        from vqa_tpu.models import create_vqa_model, init_vqa_model
        from vqa_tpu.utils.config import tiny_model_config

        model = create_vqa_model(config=tiny_model_config())
        variables = init_vqa_model(model, jax.random.PRNGKey(0))
        pth = os.path.join(args.out_dir, "fabricated_reference.pth")
        save_torch_checkpoint(variables, model.config, pth, epoch=0)
        print(f"[example] fabricated reference checkpoint: {pth}")

    ckpt_dir = os.path.join(args.out_dir, "checkpoints")

    # 1) .pth -> framework checkpoint dir
    run([sys.executable, "-m", "vqa_tpu.compat.torch_import",
         "--pth", pth, "--out-dir", ckpt_dir])

    # 2) continue training on TPU (demo data here; swap in real-data flags).
    # NOTE: the CLI-built model must match the imported architecture — pass
    # --embed-dim/--num-answers here if your checkpoint used non-defaults.
    run([sys.executable, "-m", "vqa_tpu.training.train", "--demo",
         *(["--tiny"] if tiny else []),
         "--epochs", str(args.epochs), "--checkpoint-dir", ckpt_dir,
         "--resume", "latest"])

    # 3) export back for the reference stack
    out_pth = os.path.join(args.out_dir, "tpu_trained.pth")
    run([sys.executable, "-m", "vqa_tpu.compat.torch_export",
         "--checkpoint-dir", ckpt_dir, "--out", out_pth, "--which", "latest"])
    print(f"[example] round trip complete: {out_pth}")


def run(cmd):
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
