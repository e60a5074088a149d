import time, json, sys
t0 = time.time()
import jax
t1 = time.time()
devs = jax.devices()
t2 = time.time()
import numpy as np
import jax.numpy as jnp
x = jnp.ones((1024, 1024), dtype=jnp.bfloat16)
y = (x @ x).sum()
v = float(np.asarray(y))
t3 = time.time()
print(json.dumps({"import_s": round(t1-t0,2), "devices": [str(d) for d in devs],
                  "devices_s": round(t2-t1,2), "matmul_s": round(t3-t2,2), "val": v}))
