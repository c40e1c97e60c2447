import ctypes, gc, os, time, numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
libc = ctypes.CDLL("libc.so.6")
def rss_mb():
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024

def probe(name, fn, n=40):
    gc.collect(); libc.malloc_trim(0); r0 = rss_mb()
    for i in range(n):
        fn(i)
    gc.collect(); libc.malloc_trim(0); r1 = rss_mb()
    print(f"{name}: {(r1-r0)/n:+.3f} MB/iter (RSS {r0:.0f} -> {r1:.0f})", flush=True)

# warm
x = jax.device_put(np.zeros(1000, np.int16)); np.asarray(x); del x

host = np.random.default_rng(0).integers(-3000, 3000, 1_920_000).astype(np.int16)  # 3.84 MB
def h2d(i):
    d = jax.device_put(host + np.int16(i % 3))
    d.block_until_ready()
    del d
probe("h2d 3.84MB put+free", h2d)

dev = jax.device_put(host); dev.block_until_ready()
def d2h(i):
    a = np.asarray(dev)
    del a
probe("d2h 3.84MB fetch", d2h)

f = jax.jit(lambda x: x.astype(jnp.float32) * 2.0)
def exec_and_fetch(i):
    o = f(dev)
    a = np.asarray(o)
    del o, a
probe("exec + d2h 7.7MB", exec_and_fetch)

def exec_only(i):
    o = f(dev); o.block_until_ready(); del o
probe("exec only", exec_only)
