"""Cache-warming CLI — counterpart of reference tools/prepare_graphs.py.

Builds and caches the graph for every image/mask pair so that a later
training run starts optimising immediately.  Results are discarded; the
cache is the product.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Pre-build the graph cache")
    p.add_argument("--images", required=True)
    p.add_argument("--masks", required=True)
    p.add_argument("--cache-dir", required=True)
    p.add_argument("--n-segments", type=int, default=300)
    p.add_argument("--max-size", type=int, default=512)
    p.add_argument("--augment-copies", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from ..utils import setup_compilation_cache
    setup_compilation_cache()

    from ..data.dataset import list_image_mask_pairs, prepare_dataset
    from ..graph_build import SuperpixelGraphConfig

    samples = list_image_mask_pairs(
        args.images, args.masks, max_size=args.max_size,
        augment_copies=args.augment_copies, seed=args.seed)
    if args.limit:
        samples = samples[:args.limit]
    prepare_dataset(samples,
                    SuperpixelGraphConfig(n_segments=args.n_segments),
                    cache_dir=args.cache_dir, desc="warm: ",
                    keep_segments=False)
    print(f"[Prepare] Cache ready at {args.cache_dir}")


if __name__ == "__main__":
    main()
