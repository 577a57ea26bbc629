"""Named signal tree.

Ref parity: the reference's signal system — typed, namespaced telemetry
streams (`SignalTargetInterface` sink API, ref: src/core/include/corbo-core/
signal_target_interface.h:62,89-324; Measurement/TimeSeriesSignal/
IndexedValuesSignal/MatrixSignal in signals.h:171-607) sunk into an
in-memory tree (`CommonSignalTarget`, common_signal_target.h:53), a gRPC
stream, or file exporters.

TPU-first redesign: inside jitted code, "signals" are just pytrees returned
from scans (zero-cost, fused). This module is the host-side sink: it takes
those stacked arrays after the device step and organizes them into the same
kind of named tree the reference exposes ("plant_output", "observed_states",
…), for export (core/export.py) and inspection. It deliberately does NOT
stream per-step from device — that would serialize the device loop (the
reference's gRPC-per-step design is the anti-pattern the TPU build removes;
SURVEY.md §2.7).
"""
from __future__ import annotations

import collections
from typing import Dict, Iterable, Optional

import numpy as np


class SignalGroup:
    """A namespace node: child groups + named signals (numpy arrays)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.groups: Dict[str, "SignalGroup"] = {}
        self.signals: Dict[str, dict] = {}

    def child(self, name: str) -> "SignalGroup":
        if name not in self.groups:
            self.groups[name] = SignalGroup(name)
        return self.groups[name]


class SignalRecorder:
    """In-memory signal sink (ref: CommonSignalTarget, common_signal_target.h:53).

    Names are '/'-separated namespaces: recorder.add("plant/output", t, y).
    """

    def __init__(self):
        self.root = SignalGroup()

    # -- sink API (ref: SignalTargetInterface::sendMeasurement / sendTimeSeries)
    def add_measurement(self, name: str, time, values) -> None:
        """Append one time-stamped measurement to a growing signal."""
        sig = self._signal(name, kind="measurement")
        sig.setdefault("times", []).append(float(time))
        sig.setdefault("values", []).append(np.asarray(values))

    def add_time_series(self, name: str, times, values) -> None:
        """Record a complete time series (e.g. stacked scan outputs)."""
        sig = self._signal(name, kind="time_series")
        sig["times"] = np.asarray(times)
        sig["values"] = np.asarray(values)

    def add_indexed_values(self, name: str, index, values) -> None:
        """(ref: IndexedValuesSignal, signals.h:390)"""
        sig = self._signal(name, kind="indexed")
        sig.setdefault("indices", []).append(int(index))
        sig.setdefault("values", []).append(np.asarray(values))

    def add_matrix(self, name: str, matrix) -> None:
        """(ref: MatrixSignal, signals.h:539)"""
        sig = self._signal(name, kind="matrix")
        sig.setdefault("matrices", []).append(np.asarray(matrix))

    def record_closed_loop(self, result, prefix: str = "") -> None:
        """Sink a sim.ClosedLoopResult with the reference's signal names
        (task_closed_loop_control.cpp:168-181,236)."""
        p = prefix
        ts = np.asarray(result.ts)
        self.add_time_series(p + "plant_output", ts, np.asarray(result.y))
        self.add_time_series(p + "observed_states", ts, np.asarray(result.x_observed))
        self.add_time_series(p + "applied_controls", ts, np.asarray(result.u))
        self.add_time_series(p + "plant_states", np.append(ts, ts[-1] + (ts[1] - ts[0]) if len(ts) > 1 else ts), np.asarray(result.x_true))
        for k, v in result.info.items():
            arr = np.asarray(v)
            if arr.ndim <= 2:
                self.add_time_series(p + f"controller/{k}", ts, arr)

    # -- access ------------------------------------------------------------
    def get(self, name: str) -> dict:
        group, leaf = self._walk(name)
        return group.signals[leaf]

    def names(self) -> Iterable[str]:
        out = []

        def rec(g: SignalGroup, prefix: str):
            for s in g.signals:
                out.append(prefix + s)
            for name, child in g.groups.items():
                rec(child, prefix + name + "/")

        rec(self.root, "")
        return out

    # -- internals ---------------------------------------------------------
    def _walk(self, name: str):
        parts = name.split("/")
        group = self.root
        for p in parts[:-1]:
            group = group.child(p)
        return group, parts[-1]

    def _signal(self, name: str, kind: str) -> dict:
        group, leaf = self._walk(name)
        sig = group.signals.setdefault(leaf, {"kind": kind, "name": name})
        return sig
