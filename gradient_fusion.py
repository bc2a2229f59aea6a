#!/usr/bin/env python
"""Center-node gradient fusion CLI.

Drop-in surface for the reference `gradient_fusion.py`
(--concept_cfg/--save_path/--suffix/--pretrained_models/
--optimize_unet_iters/--optimize_textenc_iters; fuse.sh:1-24). The iteration
counts are accepted for compatibility — the TPU rebuild replaces per-layer
LBFGS with an exact batched solve (see mixofshow_tpu/ops/solve.py).
"""
from __future__ import annotations

import argparse
import logging
import os

from mixofshow_tpu.fusion import compose_concepts
from mixofshow_tpu.utils.logging_utils import set_logger


def parse_args():
    parser = argparse.ArgumentParser('', add_help=False)
    parser.add_argument('--concept_cfg', help='json file for multi-concept',
                        required=True, type=str)
    parser.add_argument('--save_path', required=True, type=str,
                        help='folder name to save optimized weights')
    parser.add_argument('--suffix', help='suffix name', default='base',
                        type=str)
    parser.add_argument('--pretrained_models', required=True, type=str)
    parser.add_argument('--optimize_unet_iters', default=50, type=int)
    parser.add_argument('--optimize_textenc_iters', default=500, type=int)
    parser.add_argument('--lam_text', default=1e-4, type=float,
                        help='anchored-ridge strength (text/cross-KV solve)')
    parser.add_argument('--lam_unet', default=1e-4, type=float,
                        help='anchored-ridge strength (spatial solve)')
    parser.add_argument('--spatial_steps', default=20, type=int)
    parser.add_argument('--image_size', default=512, type=int)
    parser.add_argument('--seed', default=0, type=int)
    parser.add_argument('--solver', default='exact', type=str,
                        choices=['exact', 'lbfgs'],
                        help='exact spectral solve (default) or iterative '
                             'LBFGS parity path')
    return parser.parse_args()


if __name__ == '__main__':
    args = parse_args()
    os.makedirs(args.save_path, exist_ok=True)
    set_logger('mixofshow_tpu',
               log_file=os.path.join(
                   args.save_path, f'combined_model_{args.suffix}.log'))
    logging.getLogger('mixofshow_tpu').info('%s', args)
    compose_concepts(args.concept_cfg,
                     args.pretrained_models,
                     args.save_path,
                     suffix=args.suffix,
                     optimize_textenc_iters=args.optimize_textenc_iters,
                     optimize_unet_iters=args.optimize_unet_iters,
                     lam_text=args.lam_text,
                     lam_unet=args.lam_unet,
                     spatial_steps=args.spatial_steps,
                     image_size=args.image_size,
                     seed=args.seed,
                     solver=args.solver)
