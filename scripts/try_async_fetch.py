"""Do concurrent D2H fetches overlap over the axon tunnel?"""
import concurrent.futures as cf
import time
import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import entry

fn, (depth, plane_mat) = entry()
out = fn(depth, plane_mat)
np.asarray(out["heights"])

N = 20
# dispatch N frames
outs = [fn(depth, plane_mat) for _ in range(N)]
np.asarray(outs[-1]["heights"])  # all compute done

# serial fetches of small arrays
t0 = time.perf_counter()
for o in outs:
    np.asarray(o["tip_valid"])
t_serial = time.perf_counter() - t0

outs2 = [fn(depth, plane_mat) for _ in range(N)]
np.asarray(outs2[-1]["heights"])
t0 = time.perf_counter()
with cf.ThreadPoolExecutor(8) as ex:
    list(ex.map(lambda o: np.asarray(o["g_info"]), outs2))
t_par = time.perf_counter() - t0

print(f"serial {N} fetches: {t_serial*1e3:.1f} ms ({t_serial/N*1e3:.1f} ms each)")
print(f"parallel(8) {N} fetches: {t_par*1e3:.1f} ms ({t_par/N*1e3:.1f} ms each)")

# jax.device_get on a list: batched transfer?
outs3 = [fn(depth, plane_mat) for _ in range(N)]
np.asarray(outs3[-1]["heights"])
t0 = time.perf_counter()
jax.device_get([o["means"] for o in outs3])
print(f"device_get(list of {N}): {(time.perf_counter()-t0)*1e3:.1f} ms")

# steady-state live-loop simulation: dispatch k ahead, fetch behind
for k in (1, 2, 4):
    fn(depth, plane_mat)  # warm
    buf = []
    t0 = time.perf_counter()
    M = 30
    for i in range(M + k):
        if i < M:
            buf.append(fn(depth, plane_mat))
        if len(buf) > (k if i < M else 0):
            o = buf.pop(0)
            np.asarray(o["heights"]); np.asarray(o["tip_valid"])
    dt = (time.perf_counter() - t0) / M
    print(f"live loop depth={k}: {dt*1e3:.1f} ms/frame")
