"""GUI: web dashboard + scope rendering for the master service.

Ref parity: src/gui/ — the reference's Qt5 desktop client (main_window.h,
rpc_connection_worker.h:39, rpc_task_worker.h:39, scope_widget.h:43,
parameter_widget.h:48, signal_helper.h:40): it connects to the gRPC master,
renders reflection-generated parameter editors, runs tasks, and plots the
streamed signals in qcustomplot scopes.

TPU-era redesign: a browser dashboard instead of a desktop toolkit —
`gui.app` serves a single-page client (hand-written canvas scopes, YAML
parameter editors) and bridges it to the gRPC master over a websocket,
forwarding `performTask` signals live. `gui.scope` renders signal trees to
matplotlib figures for headless/report use (the scope_widget analogue).

Run:  python -m control_box_rst_tpu.gui --master localhost:50051 --port 8089
"""
from control_box_rst_tpu.gui.scope import render_signals, save_scope_png
from control_box_rst_tpu.gui.signal_helper import SignalBuffer

__all__ = ["render_signals", "save_scope_png", "SignalBuffer"]
