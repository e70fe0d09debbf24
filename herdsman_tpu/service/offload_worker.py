"""Offload worker daemon — the `hived` analog for elastic CPU capacity
(SURVEY.md §2.5: serves the Worker::{map,reduce} contract; reference
src/execution/worker/grpc/grpc_worker_group.cpp:85-97 is the rpc pair this
replaces, dispatched here over the lambda-style HTTP channel).

Serves POST /task with the JSON task wire form (service/offload.py
task_to_wire): loads the session's server key from the shared key
directory, reads the input partition file(s) from the shared storage
namespace, evaluates the circuit with the JAX CPU engine, and writes the
output partition file — the file's appearance doubles as the
fire-and-forget completion signal (reference filesystem_watch.cpp).

Test/chaos modes:
    --fail-first N   respond 500 (doing no work) to the first N tasks —
                     exercises the TIME_OUT retry path (executor.cpp:136-167)
    --file-only      do the work and write the output file but respond 500 —
                     exercises the file-appearance completion channel
                     (lambda_http_worker_group.cpp:244-259)

Run: python -m herdsman_tpu.service.offload_worker \
        --storage DIR --keys DIR --port P [--engine conv_i8]
"""

from __future__ import annotations

import argparse
import json
import logging
import pathlib
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

log = logging.getLogger("herdsman.offload_worker")


class _Engine:
    """Per-process caches: device server keys and compiled circuits."""

    def __init__(self, storage_dir: str, key_dir: str, engine: str):
        self.storage = pathlib.Path(storage_dir)
        self.keys = pathlib.Path(key_dir)
        self.engine = engine
        self._dsk = {}       # (session, schema) -> DeviceServerKey
        self._fns = {}       # (session, schema, circuit_json) -> jitted fn
        self._lock = threading.Lock()

    def _device_key(self, session: str, schema: int):
        from herdsman_tpu.ops.server_key import (device_server_key,
                                                 fit_engine,
                                                 layouts_for_engine)
        from herdsman_tpu.service.coordinator import deserialize_server_key

        k = (session, schema)
        with self._lock:
            if k not in self._dsk:
                path = self.keys / session / f"{schema}.key"
                sk = deserialize_server_key(path.read_bytes())
                eng = fit_engine(self.engine, sk.params)
                self._dsk[k] = (device_server_key(
                    sk, layouts=layouts_for_engine(eng)), eng)
            return self._dsk[k]

    def _compiled(self, session: str, schema: int, circuit_json: str):
        from herdsman_tpu.circuit.model import Circuit
        from herdsman_tpu.compiler.lower import compile_circuit

        k = (session, schema, circuit_json)
        with self._lock:
            cached = self._fns.get(k)
        if cached is None:
            dsk, eng = self._device_key(session, schema)
            circuit = Circuit.from_json(circuit_json)
            cached = (compile_circuit(circuit, dsk, engine=eng), circuit)
            with self._lock:
                self._fns[k] = cached
        return cached

    def _read_rows(self, session: str, ptr: dict, total_bits: int,
                   params) -> np.ndarray:
        from herdsman_tpu.service import frames as frame_codec
        from herdsman_tpu.utils import rowcodec

        path = (self.storage / session / ptr["uuid"]
                / str(ptr["partition"]))
        payloads = rowcodec.parse_rows(path.read_bytes())
        return frame_codec.payloads_to_rows(payloads, total_bits, params)

    def run_task(self, task: dict) -> None:
        import jax.numpy as jnp

        from herdsman_tpu.service import frames as frame_codec
        from herdsman_tpu.utils import rowcodec

        session = task["session_uuid"]
        schema = task["key_schema"]
        fn, circuit = self._compiled(session, schema, task["circuit"])
        dsk, _ = self._device_key(session, schema)
        p = dsk.params
        if task["type"] == "MAP":
            bits_in = circuit.num_input_bits
            rows = self._read_rows(session, task["inputs"][0], bits_in, p)
            out = np.asarray(fn(jnp.asarray(rows)))
        else:  # REDUCE: doubled input schema, pairwise fold to one row
            bits_in = circuit.num_input_bits // 2
            gathered = np.concatenate(
                [self._read_rows(session, ptr, bits_in, p)
                 for ptr in task["inputs"]], axis=0)
            rows = jnp.asarray(gathered)
            # pairwise balanced fold — same shape as
            # compiler.stages.PlanCompiler.run_reduce.fold_rows
            while rows.shape[0] > 1:
                m = rows.shape[0] // 2
                stacked = jnp.concatenate(
                    [rows[0:2 * m:2], rows[1:2 * m:2]], axis=1)
                combined = fn(stacked)
                rows = (jnp.concatenate([combined, rows[2 * m:]], axis=0)
                        if rows.shape[0] % 2 else combined)
            out = np.asarray(rows)
        out_dir = self.storage / session / task["output"]["uuid"]
        out_dir.mkdir(parents=True, exist_ok=True)
        # write-then-rename so the watcher never sees a partial file; the
        # tmp name is unique per process+task so a retried task running
        # concurrently with a hung original (two workers, same output)
        # cannot interleave writes into one tmp file — last rename wins
        # atomically with a complete payload either way
        import os as _os
        import uuid as _uuid
        final = out_dir / str(task["output"]["partition"])
        tmp = final.with_name(
            f"{final.name}.{_os.getpid()}.{_uuid.uuid4().hex[:8]}.tmp")
        try:
            tmp.write_bytes(
                rowcodec.frame_rows(frame_codec.rows_to_payloads(out)))
            tmp.replace(final)
        finally:
            # a crash/abort between write and replace must not leave the
            # unique-named tmp accumulating (round-4 advisor finding)
            tmp.unlink(missing_ok=True)


def make_server(storage_dir: str, key_dir: str, port: int = 0,
                engine: str = "conv_i8", fail_first: int = 0,
                file_only: bool = False) -> ThreadingHTTPServer:
    eng = _Engine(storage_dir, key_dir, engine)
    state = {"failed": 0}
    state_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 — http.server API
            if self.path != "/task":
                self.send_error(404)
                return
            with state_lock:
                if state["failed"] < fail_first:
                    state["failed"] += 1
                    self.send_error(500, "injected failure")
                    return
            body = self.rfile.read(int(self.headers["Content-Length"]))
            try:
                eng.run_task(json.loads(body))
            except Exception as e:  # noqa: BLE001 — worker boundary
                log.exception("task failed")
                self.send_error(500, str(e))
                return
            if file_only:
                # fire-and-forget mode: the output file is the only signal
                self.send_error(500, "file-only mode")
                return
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, fmt, *args):  # quiet
            log.debug(fmt, *args)

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--storage", required=True)
    ap.add_argument("--keys", required=True)
    ap.add_argument("--port", type=int, default=8090)
    ap.add_argument("--engine", default="conv_i8")
    ap.add_argument("--fail-first", type=int, default=0)
    ap.add_argument("--file-only", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    srv = make_server(args.storage, args.keys, args.port, args.engine,
                      args.fail_first, args.file_only)
    log.info("offload worker on port %d", srv.server_address[1])
    srv.serve_forever()


if __name__ == "__main__":
    main()
