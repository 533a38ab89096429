"""Counter-based PRNG state — the RandBLAS ``RNGState`` capability.

The reference threads a Philox (key, counter) pair through every randomized
routine: state in, advanced state out, so any computation is replayable from
the pair and independent streams come from ``state.key.incr()``
(reference: RandBLAS usage at RandLAPACK/drivers/rl_revd2.hh:166-167 and
SURVEY.md §2.9/§5.4). JAX PRNG keys are already counter-based
(Threefry/Philox family), so ``RNGState`` is a thin pytree wrapping

    key     — a JAX typed PRNG key (the Philox key)
    counter — int32 draw counter (the Philox counter)

Every draw derives ``fold_in(key, counter)`` and returns a state with
``counter + 1``; ``branch`` derives an independent key (``key.incr()``).
All methods are jit-traceable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class RNGState:
    """State-in/state-out counter-based RNG state (a pytree)."""

    __slots__ = ("key", "counter")

    def __init__(self, seed=0, *, _key=None, _counter=None):
        if _key is not None:
            self.key = _key
            self.counter = _counter
        else:
            self.key = jax.random.key(seed)
            self.counter = jnp.zeros((), jnp.int32)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.key, self.counter), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        key, counter = children
        return cls(_key=key, _counter=counter)

    # -- RandBLAS-equivalent API --------------------------------------------
    def spawn(self):
        """Return ``(draw_key, next_state)``.

        ``draw_key`` is deterministic in (key, counter); ``next_state`` has
        the counter advanced — the state-in/state-out convention every
        randomized routine follows.
        """
        draw_key = jax.random.fold_in(self.key, self.counter)
        nxt = RNGState(_key=self.key, _counter=self.counter + 1)
        return draw_key, nxt

    def branch(self, i: int = 1):
        """Independent stream — the analogue of ``state.key.incr(i)``.

        Folds in both the counter and a negative-domain branch index, so
        (a) sibling states (same key, different counters) yield distinct
        branch streams, and (b) branch keys never collide with the
        nonnegative ``spawn`` draw-key domain ``fold_in(key, counter)``.
        """
        base = jax.random.fold_in(self.key, self.counter)
        new_key = jax.random.fold_in(base, jnp.int32(-1) - jnp.int32(i))
        return RNGState(_key=new_key, _counter=jnp.zeros((), jnp.int32))

    def __repr__(self):
        return f"RNGState(counter={self.counter})"


def as_state(state_or_seed) -> RNGState:
    """Accept an RNGState or an int seed (convenience for the public API)."""
    if isinstance(state_or_seed, RNGState):
        return state_or_seed
    return RNGState(int(state_or_seed))
