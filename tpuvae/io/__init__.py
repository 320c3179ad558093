from tpuvae.io.wav import load_audio, read_wav, to_mono, resample_poly  # noqa: F401
from tpuvae.io.mp3 import mp3_available, read_mp3  # noqa: F401
from tpuvae.io.catalog import AudioEntry, collect_audio_files, load_metadata  # noqa: F401
from tpuvae.io.normalize import (  # noqa: F401
    MeanImputer,
    StandardScaler,
    impute_and_scale,
    normalize_mel_images,
)
from tpuvae.io.artifacts import (  # noqa: F401
    save_basic,
    save_advanced,
    load_basic,
    load_advanced,
)
from tpuvae.io.results import consolidate_metrics  # noqa: F401
from tpuvae.io.synthetic import (  # noqa: F401
    generate_dataset,
    generate_memory_batch,
    synth_clip,
    write_wav,
)
