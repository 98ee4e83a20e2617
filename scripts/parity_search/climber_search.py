import os, sys, time
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
import procgen2_tpu as pg
from procgen2_tpu.tools import bots
from procgen2_tpu.tools.reference_levels import reference_bank

lo, hi = int(sys.argv[1]), int(sys.argv[2])
SEEDS = list(range(lo, hi))
N = len(SEEDS)
bank_np = reference_bank("climber", SEEDS, easy_mode=True)
env = pg.make("climber", easy_mode=True)

levels = [jax.tree.map(lambda x, i=i: np.asarray(x[i]), bank_np) for i in range(N)]
bbots = [bots.ClimberBot(l) for l in levels]
ncrys = [int(l.point_exists.sum()) for l in levels]

bank = jax.tree.map(jnp.asarray, bank_np)
state = env.reset_pinned(bank, jax.random.key(123), jnp.asarray(SEEDS, jnp.uint32))
T = 1200
R = np.zeros((T, N), np.float32)
D = np.zeros((T, N), bool)
t0 = time.time()
done = np.zeros(N, bool)
for t in range(T):
    gs = state.game
    pos = np.asarray(gs.pos); vel = np.asarray(gs.vel)
    og = np.asarray(gs.on_ground); taken = np.asarray(gs.point_taken)
    acts = np.array([
        bbots[i].act(pos[i], vel[i], og[i], taken[i]) if not done[i] else 4
        for i in range(N)], np.int32)
    state, ts = env.step_raw(state, jnp.asarray(acts), render=False)
    R[t] = np.asarray(ts.reward); D[t] = np.asarray(ts.terminated)
    done |= D[t]
    if done.all():
        T = t + 1
        break
print(f"{T} steps x {N} in {time.time()-t0:.1f}s", flush=True)

ok = []
for i, s in enumerate(SEEDS):
    d = D[:T, i]; r = R[:T, i]
    if not d.any():
        print(f"seed {s}: never terminated (stuck); collected {np.count_nonzero(r)}")
        continue
    end = int(np.argmax(d))
    if r[end] != np.float32(11.0):
        print(f"seed {s}: terminated at {end} with reward {r[end]} (death?)")
        continue
    nz = r[:end + 1][r[:end + 1] != 0]
    if not all(v in (np.float32(1.0), np.float32(11.0)) for v in nz):
        print(f"seed {s}: unexpected reward values {nz}")
        continue
    ok.append((s, end, len(nz), ncrys[i]))
print("OK:", [(s, e, n, c) for s, e, n, c in ok])
print("OK seeds:", [s for s, *_ in ok], f"({len(ok)}/{N})")
