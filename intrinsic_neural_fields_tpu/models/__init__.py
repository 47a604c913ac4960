from .encoders import FourierFeatEnc, RandomFourierFeatEnc, fourier_freq_bands
from .texture_field import TextureField, TextureFieldWithViewDependency
from .factory import make_model, init_model
