"""Serving layer: HTTP proof service + worker protocol + sol_gen export."""

import http.client
import struct
import threading

import pytest


def test_sol_gen_shape():
    """VK Solidity library renders with the reference's exact line layout
    (sol_gen.hpp:8-76)."""
    from aztec_tpu.plonk.composer import MulTriple, TurboComposer
    from aztec_tpu.plonk.sol_gen import output_vk_sol

    c = TurboComposer()
    a = c.add_variable(2)
    b = c.add_variable(5)
    p = c.add_variable(10)
    c.create_mul_gate(MulTriple(a, b, p, 1, -1, 0))
    vk = c.compute_verification_key()
    sol = output_vk_sol(vk, "DemoVk")
    assert "library DemoVk {" in sol
    assert sol.count("mstore(") == 2 + 3 + 15 * 2 + 2 + 4
    for label in ("vk.Q1", "vk.QARITH", "vk.SIGMA4", "vk.g2_x.Y.c0",
                  "vk.circuit_size", "vk.contains_recursive_proof"):
        assert label in sol, label
    # every printed field element is 0x + exactly 64 hex chars (vk memory
    # offsets like 0x1c0 are shorter and not field elements)
    import re

    for m in re.finditer(r"0x[0-9a-f]{10,}", sol):
        assert len(m.group(0)) == 66


@pytest.mark.slow
def test_http_proof_service_roundtrip():
    """halloumi-shaped flow: POST /create-proof -> proof bytes verified by
    the local verifier (server.ts:42 + cli_proof_generator framing)."""
    from aztec_tpu.serving.http_server import WorkerClient, make_handler
    from http.server import ThreadingHTTPServer

    worker = WorkerClient()
    worker.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=1800)
        conn.request("GET", "/status")
        r = conn.getresponse()
        assert r.status == 200 and b"true" in r.read()

        # standard demo proof, tiny circuit (shares the cached jit shapes)
        frame = struct.pack(">II", 0x100, 4)
        conn.request("POST", "/create-proof", body=frame)
        r = conn.getresponse()
        assert r.status == 200, r.read()
        proof = r.read()
        assert len(proof) > 500

        from aztec_tpu.serving.proof_worker import _build_demo_circuit

        c = _build_demo_circuit("standard", 4)
        assert c.create_verifier().verify_proof(proof)

        # malformed request -> 400, service stays alive
        conn.request("POST", "/create-proof", body=b"\x00\x00\x00\x63")
        r = conn.getresponse()
        assert r.status == 400
        r.read()
    finally:
        httpd.shutdown()
        worker.stop()
