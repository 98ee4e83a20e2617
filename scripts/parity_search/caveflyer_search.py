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
bank_np = reference_bank("caveflyer", SEEDS, mode="hard")
env = pg.make("caveflyer", mode="hard")

levels = [jax.tree.map(lambda x, i=i: np.asarray(x[i]), bank_np) for i in range(N)]
bbots = [bots.CaveflyerBot(l) for l in levels]

bank = jax.tree.map(jnp.asarray, bank_np)
state = env.reset_pinned(bank, jax.random.key(123), jnp.asarray(SEEDS, jnp.uint32))
T = 900
R = np.zeros((T, N), np.float32)
D = np.zeros((T, N), bool)
done = np.zeros(N, bool)
t0 = time.time()
for t in range(T):
    gs = state.game
    pos = np.asarray(gs.pos); vel = np.asarray(gs.vel)
    rot = np.asarray(gs.rot); ta = np.asarray(gs.target_alive)
    acts = np.array([
        bbots[i].act(pos[i], vel[i], rot[i], ta[i]) if not done[i] else 4
        for i in range(N)], np.int32)
    state, ts = env.step_raw(state, jnp.asarray(acts), render=False)
    R[t] = np.asarray(ts.reward); D[t] = np.asarray(ts.terminated)
    done |= D[t]
    if done.all():
        T = t + 1
        break
print(f"{T} steps x {N} in {time.time()-t0:.1f}s", flush=True)

ta_end = np.asarray(state.game.target_alive)
ok = []
for i, s in enumerate(SEEDS):
    d = D[:T, i]; r = R[:T, i]
    if not d.any():
        print(f"seed {s}: stuck")
        continue
    end = int(np.argmax(d))
    endr = r[end]
    mid = r[:end]
    nz = mid[mid != 0]
    kills = int(np.count_nonzero(~ta_end[i] & np.asarray(levels[i].target_exists)))
    if endr not in (np.float32(10.0), np.float32(13.0)):
        print(f"seed {s}: end reward {endr} at {end} (death?) kills={kills}")
        continue
    if not all(v in (np.float32(3.0), np.float32(6.0)) for v in nz):
        print(f"seed {s}: odd mid rewards {nz}")
        continue
    vis = float(nz.sum()) + (float(endr) - 10.0)
    if vis < 3.0:
        print(f"seed {s}: no visible +3 (kills={kills}, end={endr})")
        continue
    ok.append((s, end, kills, vis))
print("OK:", ok)
print("OK seeds:", [s for s, *_ in ok], f"({len(ok)}/{N})")
