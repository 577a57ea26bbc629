"""Time series container with interpolation.

Ref parity: corbo::TimeSeries (ref: src/core/include/corbo-core/
time_series.h:54-62,260) — time-stamped value matrix with ZOH / linear
interpolation, extrapolation, normalization — and TimeSeriesSequence.

TPU-first redesign: a TimeSeries is an immutable pytree (times [T],
values [T, d]) whose interpolation is a pure jittable gather
(searchsorted), so references and recorded signals can be sampled inside
jitted controllers. Incremental recording happens naturally as stacked scan
outputs; `TimeSeries.from_scan` wraps them.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class TimeSeries:
    times: jax.Array   # [T]
    values: jax.Array  # [T, d]

    @property
    def n(self) -> int:
        return self.times.shape[0]

    @property
    def dim(self) -> int:
        return self.values.shape[-1]

    @staticmethod
    def from_arrays(times, values) -> "TimeSeries":
        times = jnp.asarray(times)
        values = jnp.asarray(values)
        if values.ndim == 1:
            values = values[:, None]
        return TimeSeries(times=times, values=values)

    @staticmethod
    def from_scan(ts, values) -> "TimeSeries":
        return TimeSeries.from_arrays(ts, values)

    # ---- interpolation (ref: time_series.h getValuesInterpolate) ---------
    def value_at(self, t, interpolation: str = "linear",
                 extrapolation: str = "hold") -> jax.Array:
        """Sample at time t. interpolation: 'zero_order_hold' | 'linear';
        extrapolation: 'hold' | 'linear'. Pure & jittable."""
        times, vals = self.times, self.values
        T = self.n
        idx = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, T - 1)
        idx1 = jnp.minimum(idx + 1, T - 1)
        t0, t1 = times[idx], times[idx1]
        v0, v1 = vals[idx], vals[idx1]
        if interpolation == "zero_order_hold":
            inner = v0
        else:
            w = jnp.where(t1 > t0, (t - t0) / jnp.where(t1 > t0, t1 - t0, 1.0), 0.0)
            inner = v0 + w * (v1 - v0)
        below = t < times[0]
        above = t > times[-1]
        if extrapolation == "hold":
            out = jnp.where(below, vals[0], jnp.where(above, vals[-1], inner))
        else:  # linear extrapolation from the last interval
            tm1, tm0 = times[-2] if T > 1 else times[-1] - 1.0, times[-1]
            slope = (vals[-1] - vals[-2]) / jnp.where(tm0 > tm1, tm0 - tm1, 1.0) if T > 1 else jnp.zeros_like(vals[-1])
            out = jnp.where(
                below, vals[0],
                jnp.where(above, vals[-1] + (t - tm0) * slope, inner),
            )
        return out

    # ---- transforms ------------------------------------------------------
    def normalized_time(self) -> "TimeSeries":
        """Shift so times start at 0 (ref: time_series.h normalizeTime)."""
        return self.replace(times=self.times - self.times[0])

    def shifted(self, dt) -> "TimeSeries":
        return self.replace(times=self.times + dt)

    def sliced(self, start: int, stop: int) -> "TimeSeries":
        return TimeSeries(times=self.times[start:stop], values=self.values[start:stop])

    def mean(self) -> jax.Array:
        return jnp.mean(self.values, axis=0)

    def final(self) -> jax.Array:
        return self.values[-1]

    def to_numpy(self):
        return np.asarray(self.times), np.asarray(self.values)


@pytree_dataclass
class TimeSeriesSequence:
    """Ordered collection of time series of equal dim (stacked).
    (ref: time_series.h:260 TimeSeriesSequence)"""

    times: jax.Array   # [S, T]
    values: jax.Array  # [S, T, d]

    @property
    def n_series(self) -> int:
        return self.times.shape[0]

    def series(self, i: int) -> TimeSeries:
        return TimeSeries(times=self.times[i], values=self.values[i])

    @staticmethod
    def stack(series: Sequence[TimeSeries]) -> "TimeSeriesSequence":
        return TimeSeriesSequence(
            times=jnp.stack([s.times for s in series]),
            values=jnp.stack([s.values for s in series]),
        )
