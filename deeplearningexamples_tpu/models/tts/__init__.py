from .audio import MelConfig, mel_filterbank, mel_spectrogram
from .tacotron2 import Tacotron2, Tacotron2Config, tacotron2_loss
from .task import Tacotron2Task, WaveGlowTask
from .text import N_SYMBOLS, sequence_to_text, symbols, text_to_sequence
from .waveglow import WaveGlow, WaveGlowConfig, waveglow_loss
from .inference import Denoiser, TTSPipeline, prepare_input_sequence
from .hifigan import HiFiGanConfig, HiFiGanGenerator, HiFiGanTask
from .fastpitch import FastPitch, FastPitchConfig, FastPitchTask, length_regulate
