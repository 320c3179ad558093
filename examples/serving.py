"""Serving: score NEW clips with a trained model.

Every ``train-*`` pipeline persists a serving bundle
(``results/<Arch>/serving/``: final weights, K-Means centroids of the
winning partition, rebuild metadata).  ``tpuvae.infer.ClipEncoder`` turns
raw audio (+ lyrics for the multimodal models) into latent vectors and
nearest-training-centroid cluster ids — the production loop the reference
never had (its scripts end at CSVs/plots, ``Simple_VAE.py:299-324``).

Run after ``quickstart.py`` (or any ``cli train-simple`` run) in the same
working directory.  The CLI equivalent is::

    python -m tpuvae.cli encode --arch=simple --out=enc.npz new_song.wav
"""

import numpy as np

from tpuvae.infer import ClipEncoder
from tpuvae.io.synthetic import synth_clip


def main():
    # load the bundle quickstart.py's Simple-VAE run saved; the
    # preprocessing scalers come from the data dir recorded at train time
    enc = ClipEncoder.load("simple", results_dir="results")

    # a "new" clip the model has never seen (any WAV/FLAC path works too:
    # enc.encode_paths(["new_song.wav"]))
    rng = np.random.default_rng(7)
    wave = synth_clip("rock", rng, sr=enc.pre_cfg.sample_rate,
                      duration=enc.pre_cfg.duration)
    out = enc.encode_waveforms(wave[None, :])

    print(f"latent: shape={out.latents.shape} "
          f"norm={np.linalg.norm(out.latents):.2f}")
    print(f"assigned training cluster: {int(out.clusters[0])} "
          f"of {len(enc.centers)}")

    # the multimodal archs take lyrics (and genres for cvae):
    #   enc = ClipEncoder.load("hybrid", results_dir="results")
    #   enc.encode_paths(["new_song.wav"], lyrics=["..."])

    # long-lived deployment: the same bundle behind the HTTP daemon — here
    # in-process on an ephemeral port; production runs
    #   python -m tpuvae.cli serve --arch=simple --port=8787 --batch_wait_ms=10
    import json
    import threading
    import urllib.request

    from tpuvae.serve import make_server

    server = make_server(enc, port=0, quiet=True, batch_wait_ms=10.0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
        print("daemon healthz:", json.load(r))
    server.shutdown()
    server.server_close()
    server.app.close()


if __name__ == "__main__":
    main()
