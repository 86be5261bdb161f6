"""CLI: python -m annlite_tpu.serving --n-dim 128 --port 8080 [...]"""
import argparse

from .http import serve


def main():
    ap = argparse.ArgumentParser(description='annlite_tpu HTTP server')
    ap.add_argument('--n-dim', type=int, required=True)
    ap.add_argument('--metric', default='cosine')
    ap.add_argument('--host', default='0.0.0.0')
    ap.add_argument('--port', type=int, default=8080)
    ap.add_argument('--workspace', default='./workspace')
    ap.add_argument('--shard-id', type=int, default=0)
    ap.add_argument('--shards', type=int, default=1)
    ap.add_argument('--n-subvectors', type=int, default=None)
    ap.add_argument('--index-type', default='auto')
    ap.add_argument('--rerank', type=int, default=0)
    args = ap.parse_args()
    serve(
        host=args.host,
        port=args.port,
        n_dim=args.n_dim,
        metric=args.metric,
        workspace=args.workspace,
        shard_id=args.shard_id,
        shards=args.shards,
        n_subvectors=args.n_subvectors,
        index_type=args.index_type,
        rerank=args.rerank,
    )


if __name__ == '__main__':
    main()
