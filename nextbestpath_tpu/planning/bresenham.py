"""Integer Bresenham lines in JAX (vmapped, fixed step budget).

Pixel-exact port of the reference's bresenham_line
(next_best_path/utility/long_term_utils.py:277-298), used to test planner
edges against the predicted layout image (line_across_image_pixel,
:300-331: an edge is blocked when >= 2 pixels on the line are obstacles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_LINE_STEPS = 32  # adjacent lattice nodes are ~10 px apart at 256/80 scale


@functools.partial(jax.jit, static_argnames=("max_steps",))
def bresenham_obstacle_count(x0, y0, x1, y1, image: jnp.ndarray,
                             max_steps: int = MAX_LINE_STEPS) -> jnp.ndarray:
    """Number of obstacle pixels (image[x, y] == 1) on the Bresenham line.

    Coordinates are int32 scalars; identical pixel sequence to the reference
    integer algorithm. The line must fit in max_steps pixels.
    """
    dx = jnp.abs(x1 - x0)
    dy = jnp.abs(y1 - y0)
    sx = jnp.where(x0 < x1, 1, -1)
    sy = jnp.where(y0 < y1, 1, -1)

    def body(carry, _):
        x, y, err, done, count = carry
        hit = jnp.where(done, 0.0, image[x, y])
        count = count + (hit == 1.0).astype(jnp.int32)
        finished = (x == x1) & (y == y1)
        e2 = 2 * err
        step_x = e2 > -dy
        step_y = e2 < dx
        new_err = err - jnp.where(step_x, dy, 0) + jnp.where(step_y, dx, 0)
        new_x = jnp.where(step_x, x + sx, x)
        new_y = jnp.where(step_y, y + sy, y)
        done_next = done | finished
        x = jnp.where(done_next, x, new_x)
        y = jnp.where(done_next, y, new_y)
        err = jnp.where(done_next, err, new_err)
        return (x, y, err, done_next, count), None

    init = (jnp.int32(x0), jnp.int32(y0), jnp.int32(dx - dy), jnp.bool_(False),
            jnp.int32(0))
    (x, y, err, done, count), _ = jax.lax.scan(body, init, None,
                                               length=max_steps)
    return count


bresenham_obstacle_count_v = jax.vmap(bresenham_obstacle_count,
                                      in_axes=(0, 0, 0, 0, None))
