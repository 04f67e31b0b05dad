import jax
import numpy as np
print("devices:", jax.devices())
from esp32_opus_player_tpu.models.stream_pool import StreamPool
from esp32_opus_player_tpu import DecoderConfig, decode_file
S = lambda n: f"tests/fixtures/{n}.opus"

# mixed pool exercising every new batched path, on the real TPU
names2 = ["silk_wb_stereo_20ms", "hybrid_fb_stereo_20ms"]
pool = StreamPool([S(n) for n in names2], channels=2)
outs = pool.run()
for i, n in enumerate(names2):
    ref = decode_file(S(n), DecoderConfig(channels=2, compat_ref=True))
    print(f"TPU {n}:", np.array_equal(outs[i], ref))

pool = StreamPool([S("silk_wb_mono_60ms"), S("celt_fb_mono_5ms"),
                   S("celt_nb_mono_20ms")], channels=1, compat_ref=False)
outs = pool.run()
for i, n in enumerate(("silk_wb_mono_60ms", "celt_fb_mono_5ms",
                       "celt_nb_mono_20ms")):
    ref = decode_file(S(n), DecoderConfig(channels=1, compat_ref=False))
    print(f"TPU RFC {n}:", np.array_equal(outs[i], ref))

# loss+FEC on TPU
pool = StreamPool([S("silk_wb_fec_mono_20ms")], channels=1)
out = pool.run(loss=lambda i, k: k > 0 and k % 5 == 0, fec=True)[0]
print("TPU loss+FEC frames_fec:", pool.stats()["frames_fec"],
      "samples:", out.shape[0])
