from vlsat_tpu.clipsem.text_tables import (  # noqa: F401
    HashTextEncoder,
    HFCLIPTextEncoder,
    TripletTextCache,
    build_label_tables,
)
from vlsat_tpu.clipsem.prompts import (  # noqa: F401
    no_relation_prompt,
    object_prompt,
    relation_prompt,
    triplet_prompt,
)
