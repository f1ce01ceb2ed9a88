"""sup train at chunk 12288 (T=1024 tokens): does the longer attention
window (8 query blocks/program vs 4) buy per-token efficiency over the
chunk-6000 default? Same token counts as the chunk-6000 sweep points."""
import sys

sys.path.insert(0, "/root/repo")
from prof_suptrain2 import run  # noqa: E402

if __name__ == "__main__":
    import jax
    print("backend:", jax.default_backend(), flush=True)
    for b, c in [(16, 12288), (32, 12288)]:
        run(b, chunksize=c)
    print("DONE", flush=True)
