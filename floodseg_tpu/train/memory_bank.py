"""Class-wise negative-key memory bank (U2PL) as fixed-capacity ring buffers.

Reference: per-class FIFO queues growing to queue_size (30k, class0 50k)
fed each step with ALL high-entropy teacher reps, all-gathered across GPUs
with dist.all_gather_object (/root/reference/contrastive.py:162-175,
u2pl/utils/utils.py:16-48).

TPU-native shape discipline:
- one (num_classes, capacity, dim) buffer + per-class counts/pointers —
  every shape static;
- each step enqueues a RANDOM SUBSET of up to ``max_enqueue`` masked keys
  per class (the reference enqueues all; with 30k-deep queues this only
  changes the refresh rate of the negative pool, not its distribution);
- under pjit the candidate masks/reps are global arrays, so cross-chip
  gathering is handled by the SPMD partitioner — no explicit collective
  (the all_gather_object equivalent falls out of the sharding).
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class MemoryBank(NamedTuple):
    keys: jnp.ndarray     # (C, capacity, dim) f32
    counts: jnp.ndarray   # (C,) int32 — number of valid keys (<= class cap)
    ptrs: jnp.ndarray     # (C,) int32 — ring write pointer
    caps: jnp.ndarray     # (C,) int32 — per-class effective capacity


def create_memory_bank(num_classes: int, dim: int = 256,
                       capacity: int = 30000,
                       class0_capacity: int = 50000) -> MemoryBank:
    cap = max(capacity, class0_capacity)
    caps = jnp.full((num_classes,), capacity, jnp.int32).at[0].set(class0_capacity)
    return MemoryBank(
        keys=jnp.zeros((num_classes, cap, dim), jnp.float32),
        counts=jnp.zeros((num_classes,), jnp.int32),
        ptrs=jnp.zeros((num_classes,), jnp.int32),
        caps=caps,
    )


def enqueue(bank: MemoryBank, class_idx: int, new_keys: jnp.ndarray,
            valid: jnp.ndarray) -> MemoryBank:
    """Ring-write up to M keys for a (static) class. new_keys (M, dim),
    valid (M,) bool with all valid entries FIRST (masked_subset layout)."""
    m = new_keys.shape[0]
    cap = bank.caps[class_idx]
    n_new = jnp.sum(valid).astype(jnp.int32)
    offs = jnp.arange(m, dtype=jnp.int32)
    slots = (bank.ptrs[class_idx] + offs) % cap
    # route invalid writes to the scratch row at index capacity_max
    # (buffer is (cap_max, dim); clip writes beyond the class cap too)
    slots = jnp.where(valid, slots, bank.keys.shape[1])
    keys_c = bank.keys[class_idx]
    # pad one scratch row, scatter, drop it
    padded = jnp.concatenate([keys_c, jnp.zeros((1, keys_c.shape[1]), keys_c.dtype)])
    padded = padded.at[slots].set(new_keys.astype(keys_c.dtype))
    new_keys_c = padded[:-1]
    return MemoryBank(
        keys=bank.keys.at[class_idx].set(new_keys_c),
        counts=bank.counts.at[class_idx].set(
            jnp.minimum(bank.counts[class_idx] + n_new, cap)
        ),
        ptrs=bank.ptrs.at[class_idx].set(
            (bank.ptrs[class_idx] + n_new) % cap
        ),
        caps=bank.caps,
    )


def sample_negatives(rng, bank: MemoryBank, class_idx: int,
                     n: int) -> jnp.ndarray:
    """n indices uniform over the class's valid keys (with replacement),
    matching the reference's randint into the queue (loss_helper.py:208-214).
    Callers gate on counts[class_idx] > 0."""
    count = jnp.maximum(bank.counts[class_idx], 1)
    idx = jax.random.randint(rng, (n,), 0, count)
    return bank.keys[class_idx][idx]
