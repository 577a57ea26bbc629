"""gRPC communication layer: master service + client round trips.

Ref parity tested: the reference's MasterService contract
(master_service.proto — set*/get* config, verifyConfig, performTask
streaming signals, ping/stop; served by Master, master.cpp:362-379,
consumed by MasterServiceClient, main_service_client.h:52).
"""
from concurrent import futures

import grpc
import numpy as np
import pytest

from control_box_rst_tpu.comm import MasterClient, MasterServer, pb
from control_box_rst_tpu.comm.service import merge_signal, proto_to_signal, signal_to_protos

CONFIG = {
    "experiment": {"task": "closed_loop", "T_steps": 8, "dt": 0.1},
    "system": {"type": "serial_integrators", "params": {"nx": 2, "nu": 1}},
    "grid": {"type": "fd", "N": 6, "fd_scheme": "crank_nicolson"},
    "cost": {
        "type": "quadratic_form",
        "Q": [[1.0, 0.0], [0.0, 1.0]],
        "R": [[0.1]],
        "Qf": [[10.0, 0.0], [0.0, 10.0]],
    },
    "bounds": {"u_min": -1.0, "u_max": 1.0},
    "x0": [1.0, 0.0],
    "solver": {"max_iter": 4},
}


@pytest.fixture(scope="module")
def client():
    master = MasterServer()
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
    server.add_generic_rpc_handlers((master.grpc_handler(),))
    port = server.add_insecure_port("localhost:0")
    server.start()
    c = MasterClient(f"localhost:{port}")
    yield c
    c.close()
    server.stop(grace=None)


def test_ping(client):
    assert client.ping()


def test_config_round_trip(client):
    st = client.set_config(CONFIG)
    assert st.ok, st.text
    task = client.get_section("task")
    assert task["experiment"]["T_steps"] == 8
    ctrl = client.get_section("controller")
    assert ctrl["grid"]["N"] == 6
    assert ctrl["x0"] == [1.0, 0.0]


def test_section_setters_and_validation(client):
    st = client.set_task({"experiment": {"task": "closed_loop", "T_steps": 5, "dt": 0.1}})
    assert st.ok
    # wrong keys for a section are rejected
    st = client.set_plant({"system": {"type": "van_der_pol"}})
    assert not st.ok and "not valid" in st.text
    # malformed YAML is rejected with a status, not a crash
    bad = pb.ComponentConfig(kind="task", yaml="a: [unclosed")
    st = client._stubs["setTask"](bad)
    assert not st.ok and "YAML" in st.text


def test_verify_config(client):
    client.set_config(CONFIG)
    ok, text = client.verify_config()
    assert ok, text
    # break it: controller dims vs plant dims mismatch
    broken = dict(CONFIG)
    broken["plant"] = {"system": {"type": "van_der_pol"}}
    broken["cost"] = {"type": "quadratic_form", "Q": [[1.0, 0], [0, 1.0]], "R": [[0.1]]}
    client.set_config(broken)
    ok, text = client.verify_config()
    # serial_integrators(2,1) vs van_der_pol(2,1) actually match dims; force nx=3
    broken["system"] = {"type": "serial_integrators", "params": {"nx": 3, "nu": 1}}
    broken["cost"]["Q"] = np.eye(3).tolist()
    broken["x0"] = [1.0, 0.0, 0.0]
    client.set_config(broken)
    ok, text = client.verify_config()
    assert not ok and "dims" in text.lower() or "nx" in text


def test_available_signals(client):
    client.set_config(CONFIG)
    sigs = client.available_signals()
    assert "plant_output" in sigs and "applied_controls" in sigs


def test_perform_task_streams_signals(client):
    client.set_config(CONFIG)
    ok, text = client.verify_config()
    assert ok, text
    store = client.perform_task()
    # progress bracketing + the reference's closed-loop signal names
    assert "master/progress" in store
    for name in ("plant_output", "observed_states", "applied_controls", "plant_states"):
        assert name in store, sorted(store)
    u = store["applied_controls"]["values"]
    assert u.shape[0] == 8
    assert np.all(np.abs(u) <= 1.0 + 1e-6)
    xs = store["plant_states"]["values"]
    # regulation toward the origin from x0=[1,0]
    assert abs(xs[-1][0]) < abs(xs[0][0])


def test_signal_proto_round_trip():
    sig = {"kind": "time_series", "times": np.arange(3.0),
           "values": np.arange(6.0).reshape(3, 2)}
    msgs = list(signal_to_protos("a/b", sig))
    assert len(msgs) == 1
    name, back = proto_to_signal(msgs[0])
    assert name == "a/b"
    np.testing.assert_allclose(back["values"], sig["values"])
    np.testing.assert_allclose(back["times"], sig["times"])

    mat = {"kind": "matrix", "matrices": [np.eye(2), np.ones((1, 3))]}
    store = {}
    for m in signal_to_protos("m", mat):
        n, s = proto_to_signal(m)
        merge_signal(store, n, s)
    assert len(store["m"]["matrices"]) == 2
    np.testing.assert_allclose(store["m"]["matrices"][1], np.ones((1, 3)))
