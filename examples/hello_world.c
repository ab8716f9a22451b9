/* C hello-world against the drop-in edlib C ABI (native/edlib_compat.h) —
 * the counterpart of the reference's apps/hello-world/helloWorld.c, plus a
 * PATH/CIGAR round trip to show result ownership.
 *
 * Build (after `make -C native`):
 *   gcc examples/hello_world.c -Inative -Lnative -ledlib_tpu_native \
 *       -Wl,-rpath,'$ORIGIN/../native' -o hello_world_c
 */
#include <stdio.h>
#include <stdlib.h>

#include "edlib_compat.h"

int main(void) {
    EdlibAlignResult d = edlibAlign("telephone", 9, "elephant", 8,
                                    edlibDefaultAlignConfig());
    printf("edit_distance('telephone', 'elephant') = %d\n", d.editDistance);
    edlibFreeAlignResult(d);

    EdlibAlignConfig cfg = edlibNewAlignConfig(-1, EDLIB_MODE_HW,
                                               EDLIB_TASK_PATH, NULL, 0);
    EdlibAlignResult r = edlibAlign("ACT", 3, "CGACTGAC", 8, cfg);
    char* cigar = edlibAlignmentToCigar(r.alignment, r.alignmentLength,
                                        EDLIB_CIGAR_EXTENDED);
    printf("HW 'ACT' in 'CGACTGAC': d=%d at [%d..%d], cigar=%s\n",
           r.editDistance, r.startLocations[0], r.endLocations[0], cigar);
    free(cigar);
    edlibFreeAlignResult(r);
    return 0;
}
