"""Serving latency bench: p50/p99 per-request latency and throughput for the
image /generate endpoint under concurrent load, plus a micro-batching
on/off A/B (serve/server.py::_run_batch coalescing).

Protocol matches bench.py's headline (celebahq 256^2, NFE=100, bf16 on TPU):
the serving layer wraps the SAME jitted sample_images program, so this
measures what the queueing/coalescing/HTTP layers add around the known
device time.  Params are freshly initialized (allow_init=True) — latency is
identical to trained weights since the compiled program is identical; the
reference has no serving layer to compare against (SURVEY.md §1), so the
numbers are recorded as absolute capability, not vs_baseline.

Load model: closed-loop — C concurrent HTTP clients each issue R sequential
POST /generate {"n":1} requests (distinct seeds) and time each round trip.

A/B:
  batching ON  — service_batch=8, linger 20 ms: concurrent requests coalesce
                 into full device batches (one DDIM scan serves 8 requests).
  batching OFF — service_batch=1: every request is its own device batch
                 (what a naive one-request-one-call server would do).

Prints one JSON line per mode plus a final headline line.
"""

import json
import os
import threading
import time
import urllib.request

import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ddmi_tpu.core.config import load_config
from ddmi_tpu.serve.server import SamplerService, make_http_server

NFE = 100
RESOLUTION = 256
CLIENTS = int(os.environ.get("DDMI_SERVE_CLIENTS", "16"))
REQS_PER_CLIENT = int(os.environ.get("DDMI_SERVE_REQS", "4"))


def _percentile(xs, q):
    xs = sorted(xs)
    if not xs:
        return None
    i = min(len(xs) - 1, max(0, int(round(q / 100.0 * (len(xs) - 1)))))
    return xs[i]


def _drive(port: int, clients: int, reqs: int):
    """Closed-loop load: returns (latencies_sec, wall_sec)."""
    lats, errs = [], []
    lock = threading.Lock()

    def client(cid: int):
        for r in range(reqs):
            body = json.dumps(
                {"n": 1, "seed": cid * 1000 + r, "format": "npy"}
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=body,
                headers={"Content-Type": "application/json"},
            )
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=600) as resp:
                    resp.read()
                dt = time.perf_counter() - t0
                with lock:
                    lats.append(dt)
            except Exception as e:  # recorded, not fatal
                with lock:
                    errs.append(repr(e))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errs:
        raise RuntimeError(f"{len(errs)} request errors, first: {errs[0]}")
    return lats, wall


def bench_mode(cfg, service_batch: int, linger_ms: float, label: str):
    svc = SamplerService(
        cfg,
        service_batch=service_batch,
        resolution=RESOLUTION,
        linger_ms=linger_ms,
        allow_init=True,
    )
    svc.warmup()
    server = make_http_server(svc, "127.0.0.1", 0)
    port = server.server_address[1]
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    try:
        # solo request first: the un-contended latency floor (one device
        # batch serving one request, after the linger window)
        solo_lats, _ = _drive(port, clients=1, reqs=3)
        lats, wall = _drive(port, CLIENTS, REQS_PER_CLIENT)
        n = len(lats)
        rec = {
            "metric": f"serve latency, image {RESOLUTION}^2 NFE={NFE}, {label}",
            "value": round(_percentile(lats, 50), 3),
            "unit": "s p50 per request",
            "p50_s": round(_percentile(lats, 50), 3),
            "p99_s": round(_percentile(lats, 99), 3),
            "solo_p50_s": round(_percentile(solo_lats, 50), 3),
            "throughput_req_per_s": round(n / wall, 3),
            "clients": CLIENTS,
            "requests": n,
            "service_batch": service_batch,
            "linger_ms": linger_ms,
        }
        print(json.dumps(rec), flush=True)
        return rec
    finally:
        server.shutdown()
        server.server_close()
        svc.close()


def main():
    cfg = load_config(
        os.environ.get("DDMI_BENCH_CONFIG", "configs/ldm/celebahq.yaml")
    )
    object.__setattr__(cfg.model.ddpmconfig, "sampling_timesteps", NFE)

    on = bench_mode(cfg, service_batch=8, linger_ms=20.0, label="batching ON (8)")
    off = bench_mode(cfg, service_batch=1, linger_ms=0.0, label="batching OFF (1)")

    print(
        json.dumps(
            {
                "metric": f"serve micro-batching A/B, image {RESOLUTION}^2 "
                f"NFE={NFE}, {CLIENTS} concurrent clients",
                "value": round(
                    on["throughput_req_per_s"] / off["throughput_req_per_s"], 2
                ),
                "unit": "x throughput (batching ON / OFF)",
                "on": on,
                "off": off,
                "vs_baseline": None,
                "baseline": "reference has no serving layer (SURVEY.md §1); "
                "absolute capability record",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
