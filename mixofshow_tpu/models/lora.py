"""Functional LoRA: low-rank deltas as a standalone pytree.

TPU-native replacement for the reference's `LoRALinearLayer` monkey-patching
(reference: mixofshow/models/edlora.py:221-246). Instead of mutating module
forwards, LoRA params live in a tree that *mirrors* the base model's param
tree: wherever the base has a dense/1x1-conv leaf dict {'kernel', 'bias'},
the LoRA tree may have {'down': (in, r), 'up': (r, out)} at the same path.
Model apply functions thread the matching subtree to each call site, so:

  * training: gradients flow only through the LoRA tree (base is a closure
    constant) — no requires_grad bookkeeping;
  * deployment: `merge_into` folds W += alpha * down @ up in one vectorized
    pass (reference: convert_edlora_to_diffusers.py:33-76);
  * fusion: LoRA trees of many concepts are plain data to be solved over.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixofshow_tpu.models.layers import as_rng


def init_lora_leaf(rng, in_dim: int, out_dim: int, rank: int = 4,
                   dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """kaiming-uniform down (a=sqrt(5), matching edlora.py:238), zero up."""
    rng = as_rng(rng)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        'down': rng.uniform(-bound, bound, (in_dim, rank)).astype(dtype),
        'up': np.zeros((rank, out_dim), dtype),
    }


def is_lora_leaf(node) -> bool:
    return isinstance(node, dict) and set(node) == {'down', 'up'}


def is_linear_leaf(node) -> bool:
    """A base-param leaf LoRA can attach to: dense or 1x1 conv kernel."""
    if not (isinstance(node, dict) and 'kernel' in node):
        return False
    k = node['kernel']
    return k.ndim == 2 or (k.ndim == 4 and k.shape[0] == 1 and k.shape[1] == 1)


def init_lora_tree(rng, base_params, path_filter: Callable[[str], bool],
                   rank: int = 4, dtype=jnp.float32):
    """Build a LoRA tree for every linear leaf whose '/'-joined path passes
    `path_filter`. Returns a nested dict sharing the base tree's structure
    (missing branches simply absent)."""
    leaves = []

    def collect(node, path):
        if is_linear_leaf(node):
            if path_filter(path):
                leaves.append(path)
            return
        if isinstance(node, dict):
            for name, child in node.items():
                collect(child, f'{path}/{name}' if path else name)
        elif isinstance(node, (list, tuple)):
            for i, child in enumerate(node):
                collect(child, f'{path}/{i}' if path else str(i))

    collect(base_params, '')
    rng = as_rng(rng)
    tree: Dict = {}
    for path in leaves:
        base_leaf = get_path(base_params, path)
        kern = base_leaf['kernel']
        in_dim, out_dim = (kern.shape[-2], kern.shape[-1])
        set_path(tree, path, init_lora_leaf(rng, in_dim, out_dim, rank, dtype))
    return tree


def get_path(tree, path: str):
    node = tree
    for part in path.split('/'):
        node = node[int(part)] if isinstance(node, (list, tuple)) else node[part]
    return node


def set_path(tree: dict, path: str, value):
    parts = path.split('/')
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def maybe(tree: Optional[dict], *names):
    """Walk `names` through an optional LoRA tree; None when absent.

    Model code uses this to thread subtrees: `maybe(lora, 'down_blocks', 0)`."""
    node = tree
    for name in names:
        if node is None:
            return None
        if isinstance(node, (list, tuple)):
            name = int(name)
            node = node[name] if name < len(node) else None
        else:
            node = node.get(str(name)) if isinstance(name, int) else node.get(name)
    return node


def flatten_lora(tree, prefix: str = '') -> Dict[str, Dict[str, jnp.ndarray]]:
    """{path: {'down', 'up'}} for I/O and fusion."""
    out = {}

    def walk(node, path):
        if is_lora_leaf(node):
            out[path] = node
            return
        if isinstance(node, dict):
            for name, child in node.items():
                walk(child, f'{path}/{name}' if path else name)

    walk(tree, prefix)
    return out


def num_lora_leaves(tree) -> int:
    return len(flatten_lora(tree))


def merge_into(base_params, lora_tree, alpha: float = 1.0):
    """Fold every LoRA delta into the base weights (deployment path,
    reference convert_edlora_to_diffusers.py:64-73). Returns a new tree."""
    def walk(base_node, lora_node, setter):
        if lora_node is None:
            return
        if is_lora_leaf(lora_node):
            kern = base_node['kernel']
            delta = (lora_node['down'] @ lora_node['up']).astype(kern.dtype)
            if kern.ndim == 4:  # 1x1 conv, HWIO
                delta = delta[None, None]
            new_node = dict(base_node)
            new_node['kernel'] = kern + alpha * delta
            setter(new_node)
            return
        if isinstance(base_node, dict):
            for name, lchild in lora_node.items():
                if name in base_node:
                    def make_setter(n=name, b=base_node):
                        def s(v):
                            b[n] = v
                        return s
                    walk(base_node[name], lchild, make_setter())
        elif isinstance(base_node, list):
            for name, lchild in lora_node.items():
                i = int(name)
                def make_setter(idx=i, b=base_node):
                    def s(v):
                        b[idx] = v
                    return s
                walk(base_node[i], lchild, make_setter())

    # deep-copy container structure so setters don't alias the input tree
    def deep_copy(node):
        if isinstance(node, dict):
            return {k: deep_copy(v) for k, v in node.items()}
        if isinstance(node, list):
            return [deep_copy(v) for v in node]
        return node

    merged = deep_copy(base_params)
    walk(merged, lora_tree, lambda v: None)
    return merged
