"""Communication layer: gRPC master service + client.

Ref parity: src/communication/ — the reference's protobuf schema and gRPC
plumbing (master_service.proto, main_service_client.h:52,
signal_target_rpc.h:55). Strictly a control/telemetry plane: nothing here
touches the numeric hot path (SURVEY.md §2.7).
"""
from control_box_rst_tpu.comm import master_service_pb2 as pb
from control_box_rst_tpu.comm.client import MasterClient
from control_box_rst_tpu.comm.server import MasterServer, serve
from control_box_rst_tpu.comm.service import (
    SERVICE_NAME,
    proto_to_signal,
    signal_to_protos,
)

__all__ = [
    "pb",
    "MasterClient",
    "MasterServer",
    "serve",
    "SERVICE_NAME",
    "signal_to_protos",
    "proto_to_signal",
]
