from morphablediffusion_tpu.fitting.flame import (
    FlameModel,
    flame_forward,
    flame_landmarks,
    load_model,
    random_model,
    rodrigues,
)
from morphablediffusion_tpu.fitting.fit import (
    FitConfig,
    fit_landmarks,
    fit_two_photos,
)
