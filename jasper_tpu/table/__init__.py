from jasper_tpu.table.kmer_table import (  # noqa: F401
    DeviceKmerTable,
    empty_table,
    insert_kmers,
    lookup_kmers,
)
from jasper_tpu.table.host_table import HostKmerTable  # noqa: F401
