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

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
