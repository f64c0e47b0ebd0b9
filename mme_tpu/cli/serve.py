"""Serving daemon entry: put a StableHLO bundle behind HTTP.

    python -m mme_tpu.cli.serve --bundle runs/bundle --port 8000
    curl -s localhost:8000/healthz
    curl -s -X POST localhost:8000/predict -d '{"instances": [...]}'

The bundle is the deployment artifact ``run_classifier`` writes under
``MME_EXPORT_BUNDLE`` (serve.py: jax.export StableHLO + raw weights — no
model code needed at serve time). The reference's deployment story is
re-running eval notebooks against a checkpoint
(``EvaluationScripts/*_eval.ipynb``); this is the production counterpart.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("mme_tpu serving daemon")
    p.add_argument("--bundle", required=True,
                   help="export_bundle directory (MME_EXPORT_BUNDLE)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args(argv)

    from mme_tpu.serve_http import serve_bundle
    server = serve_bundle(args.bundle, args.host, args.port)
    host, port = server.server_address[:2]
    print(f"serving {args.bundle} on http://{host}:{port} "
          "(POST /predict, GET /healthz)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
