#!/usr/bin/env python3
"""Non-JVM client for the graft QueryServer protocol — demonstrates the
reference's client role (async_query_client.rs) from Python: run a
query, poll status, page results as JSON rows AND as Arrow IPC
(format:"arrow"), decoding the IPC stream with pyarrow.

Usage: python3 tools/pyclient.py <port> "<sql>"
"""
import base64
import io
import json
import socket
import sys
import time


class Client:
    def __init__(self, port, host="127.0.0.1"):
        self.sock = socket.create_connection((host, port))
        self.rfile = self.sock.makefile("r", encoding="utf-8")
        # the reference's connection-open handshake
        # (async_query_client.rs:174-202): identify with a fresh
        # connection id, expect the worker to identify back
        import uuid
        self.connection_id = str(uuid.uuid4())
        resp = self.call(type="identify", connection_id=self.connection_id)
        if resp.get("type") != "identify_resp" or not resp.get("worker_id"):
            raise RuntimeError(f"identify failed: {resp}")
        self.worker_id = resp["worker_id"]

    def call(self, **req):
        self.sock.sendall((json.dumps(req) + "\n").encode())
        return json.loads(self.rfile.readline())

    def run(self, sql, timeout_s=120, server_timeout_ms=None):
        """Push-based completion: watch_query acks immediately, then the
        server pushes a query_update line when the query lands — no
        polling loop (the reference's DEV_NOTES polling TODO).
        server_timeout_ms sets the statement's server-side runtime
        budget (the service cancels it and reports [QUERY_TIMEOUT])."""
        req = dict(type="run_query", query=sql)
        if server_timeout_ms is not None:
            req["timeout_ms"] = server_timeout_ms
        qid = self.call(**req)["query_id"]
        ack = self.call(type="watch_query", query_id=qid)
        if ack.get("type") != "watch_query_resp":
            raise RuntimeError(f"watch failed: {ack}")
        self.sock.settimeout(timeout_s)
        update = json.loads(self.rfile.readline())  # blocks until pushed
        if update.get("status") == "complete":
            return qid
        raise RuntimeError(update.get("message", str(update)))

    def run_polling(self, sql, timeout_s=120):
        """The poll-loop variant, kept for protocol coverage."""
        qid = self.call(type="run_query", query=sql)["query_id"]
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            st = self.call(type="get_query_status", query_id=qid)
            if st["status"] == "complete":
                return qid
            if st["status"] == "error":
                raise RuntimeError(st.get("message"))
            time.sleep(0.1)
        raise TimeoutError(qid)

    def pages_json(self, qid, limit=10):
        cur = {"file_idx": 0, "row_idx": 0}
        while cur is not None:
            resp = self.call(type="get_query_data", query_id=qid,
                             file_idx=cur["file_idx"], row_idx=cur["row_idx"],
                             limit=limit)
            yield resp["columns"], resp["rows"]
            cur = resp["next"]

    def page_arrow(self, qid, limit=10):
        """First page as a pyarrow RecordBatch (the reference's payload
        format: Arrow IPC)."""
        import pyarrow as pa
        resp = self.call(type="get_query_data", query_id=qid,
                         row_idx=0, limit=limit, format="arrow")
        buf = base64.b64decode(resp["arrow_ipc"])
        reader = pa.ipc.open_stream(io.BytesIO(buf))
        return reader.read_all()

    def service_stats(self):
        """Admission snapshot: statements queued for a slot, running in
        one, and the slot count."""
        return self.call(type="get_service_stats")

    def metrics(self, qid, timeout_s=10):
        """Runtime metrics (scan/shuffle/spill/time). The listener bus
        is async — poll briefly until the scan rows land."""
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            resp = self.call(type="get_query_metrics", query_id=qid)
            if resp.get("type") == "get_query_metrics_resp" \
                    and resp.get("input_rows", 0) > 0:
                return resp
            time.sleep(0.1)
        return resp


def main():
    port, sql = int(sys.argv[1]), sys.argv[2]
    c = Client(port)
    print(f"identified with worker {c.worker_id}")
    qid = c.run(sql)
    print(f"query {qid} complete")
    n = 0
    for cols, rows in c.pages_json(qid):
        if n == 0:
            print("columns:", cols)
        for r in rows:
            print("  ", r)
        n += len(rows)
    print(f"{n} rows via JSON pages")
    tbl = c.page_arrow(qid)
    print(f"arrow page: {tbl.num_rows} rows, schema: {tbl.schema}")
    m = c.metrics(qid)
    print(f"metrics: {m.get('input_rows')} rows / {m.get('input_bytes')} B scanned, "
          f"{m.get('shuffle_read_bytes')} B shuffled, "
          f"{m.get('wall_time_ms')} ms wall, "
          f"{m.get('queue_wait_ms')} ms queued")
    s = c.service_stats()
    print(f"service: {s.get('queued')} queued / {s.get('running')} running "
          f"of {s.get('slots')} slots")


if __name__ == "__main__":
    main()
