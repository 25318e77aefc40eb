from .vqvae import VQVAE, codebook_signature
from .pae import PAE, PhaseExtractor, velocity_input
from .gru_baseline import GeneratorGRU, GeneratorLinear, WavEncoder
from .resync import Discriminator, ResyncNet
from .seq2seq import Seq2SeqNet
from .simple_vqvae import SimpleVQVAE
from .wavlm import WavLMJax, WavLMJaxConfig
from .vq_wav2vec import VQWav2Vec, VQWav2VecConfig

__all__ = ["VQVAE", "codebook_signature", "PAE", "PhaseExtractor",
           "velocity_input", "GeneratorGRU", "GeneratorLinear",
           "WavEncoder", "Discriminator", "ResyncNet", "Seq2SeqNet",
           "SimpleVQVAE", "WavLMJax", "WavLMJaxConfig",
           "VQWav2Vec", "VQWav2VecConfig"]
