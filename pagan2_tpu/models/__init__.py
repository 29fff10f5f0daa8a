from . import alphabets
from .alphabets import Alphabet, get_alphabet, DNA, PROTEIN, CODON
from .evol_model import EvolModel, ModelFactory, IndelParams
