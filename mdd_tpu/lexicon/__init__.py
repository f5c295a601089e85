from mdd_tpu.lexicon.phones import (
    CMU39,
    VOWELS,
    CONSONANTS,
    CANONICAL_UNITS_41,
    CANONICAL_UNITS_43,
    CMU_TO_IPA,
    IPA_TO_CMU,
    normalize_annotated_phone,
    normalize_canonical_phone,
)
from mdd_tpu.lexicon.timit import TIMIT_60_48, TIMIT_60_41, TIMIT_48_39, map_timit_phones
