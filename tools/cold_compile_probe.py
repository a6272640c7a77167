"""Honest-cold compile probe for the headline bench (VERDICT r4 item 7).

Runs bench.py's headline with a FRESH compilation-cache directory and
reports the cold compile+check wall time plus the cache entries the run
creates (name, size) — the candidate seed set for pre-warming.

    python tools/cold_compile_probe.py [cache_dir]
"""
import os
import sys
import tempfile


def main():
    cache_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="pyitd_cold_cache_")
    os.makedirs(cache_dir, exist_ok=True)
    before = set(os.listdir(cache_dir))

    # bench.main() honors this override (it would otherwise point the
    # cache back at the repo's warm .jax_cache)
    os.environ["PYITD_CACHE_DIR"] = cache_dir
    os.environ["PYITD_BENCH_HEADLINE_ONLY"] = "1"
    import bench

    bench.main()

    entries = []
    for name in sorted(set(os.listdir(cache_dir)) - before):
        entries.append((name, os.path.getsize(os.path.join(cache_dir, name))))
    total = sum(s for _, s in entries)
    print(f"cache entries created: {len(entries)}, total "
          f"{total/1e6:.1f} MB (dir: {cache_dir})", file=sys.stderr)
    for name, size in entries:
        print(f"  {size/1e3:10.1f} kB  {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
