from tpuvae.dsp.primitives import (  # noqa: F401
    hann_window,
    num_frames,
    frame_signal,
    stft_power,
    fft_frequencies,
    mel_filterbank,
    power_to_db,
    dct_ii_ortho,
)
from tpuvae.dsp.features import (  # noqa: F401
    resolve_numerics,
    resolve_transfer_dtype,
    mel_power_from_stft,
    mel_db_ref_max,
    mfcc_from_mel_power,
    spectral_centroid,
    spectral_bandwidth,
    spectral_rolloff,
    zero_crossing_rate,
    rms,
    extract_basic_features,
    extract_mel_image,
    extract_flat_features,
    extract_advanced,
    jit_extractor,
)
from tpuvae.dsp.chroma import (  # noqa: F401
    chroma_filterbank,
    chroma_from_power,
    chroma_batch,
    estimate_tuning_from_power,
    piptrack_from_power,
)
from tpuvae.dsp.long import (  # noqa: F401
    stft_power_framesharded,
    mel_image_framesharded,
)
