/* Drop-in C ABI compatibility header for reference-edlib users.
 *
 * Declares the same five extern "C" entry points, enums, and structs as the
 * reference public header (edlib.h:30-271) so that existing C/C++ callers
 * recompile against edlib_tpu's native runtime with zero source changes.
 * The layouts and enum values below are the reference's public ABI contract
 * and therefore must match it exactly; the implementation behind them
 * (edlib_compat.cpp) is this project's own engine.
 *
 * Byte-exact against the compiled reference across modes, tasks, k,
 * equality pairs, and the full 256-symbol alphabet range
 * (tests/test_c_compat.py fuzzes this shim field by field).
 */

#ifndef EDLIB_TPU_COMPAT_H
#define EDLIB_TPU_COMPAT_H

#ifdef __cplusplus
extern "C" {
#endif

/* Status codes (edlib.h:30-31). */
#define EDLIB_STATUS_OK 0
#define EDLIB_STATUS_ERROR 1

/* Alignment methods (edlib.h:36-63). */
typedef enum {
    EDLIB_MODE_NW,   /* global: both sequences consumed end to end */
    EDLIB_MODE_SHW,  /* prefix: gaps after the query end are free  */
    EDLIB_MODE_HW,   /* infix: gaps before and after query are free */
} EdlibAlignMode;

/* What to compute (edlib.h:67-77). */
typedef enum {
    EDLIB_TASK_DISTANCE,  /* edit distance + end locations          */
    EDLIB_TASK_LOC,       /* + start locations                      */
    EDLIB_TASK_PATH,      /* + full alignment path for first pair   */
} EdlibAlignTask;

/* CIGAR flavours (edlib.h:81-91). */
typedef enum {
    EDLIB_CIGAR_STANDARD,  /* M/I/D   */
    EDLIB_CIGAR_EXTENDED,  /* =/I/D/X */
} EdlibCigarFormat;

/* Edit operation codes used in EdlibAlignResult.alignment (edlib.h:93-97). */
#define EDLIB_EDOP_MATCH 0
#define EDLIB_EDOP_INSERT 1   /* insertion to target (gap in target)  */
#define EDLIB_EDOP_DELETE 2   /* deletion from target (gap in query)  */
#define EDLIB_EDOP_MISMATCH 3

/* A user-supplied pair of characters to treat as equal (edlib.h:99-106). */
typedef struct {
    char first;
    char second;
} EdlibEqualityPair;

/* Alignment configuration (edlib.h:108-140). */
typedef struct {
    int k;                 /* max distance to search; <0 = unbounded     */
    EdlibAlignMode mode;
    EdlibAlignTask task;
    const EdlibEqualityPair* additionalEqualities;
    int additionalEqualitiesLength;
} EdlibAlignConfig;

/* Alignment result (edlib.h:158-195).  Dynamic arrays are malloc'd and
 * owned by the caller; release them with edlibFreeAlignResult. */
typedef struct {
    int status;              /* EDLIB_STATUS_*                           */
    int editDistance;        /* -1 when no solution within k             */
    int* endLocations;       /* all minimal end positions, or NULL       */
    int* startLocations;     /* per end location (LOC/PATH), or NULL     */
    int numLocations;
    unsigned char* alignment;   /* EDLIB_EDOP_* codes (PATH), or NULL    */
    int alignmentLength;
    int alphabetLength;      /* distinct symbols across both sequences   */
} EdlibAlignResult;

/* The five public functions (edlib.h:146-271). */

EdlibAlignConfig edlibNewAlignConfig(
    int k, EdlibAlignMode mode, EdlibAlignTask task,
    const EdlibEqualityPair* additionalEqualities,
    int additionalEqualitiesLength);

EdlibAlignConfig edlibDefaultAlignConfig(void);

void edlibFreeAlignResult(EdlibAlignResult result);

EdlibAlignResult edlibAlign(
    const char* query, int queryLength,
    const char* target, int targetLength,
    EdlibAlignConfig config);

/* Run-length encode an alignment to a NUL-terminated CIGAR string
 * (malloc'd; caller frees).  Returns NULL on an unknown format or an
 * invalid op code (edlib.h:255-271). */
char* edlibAlignmentToCigar(
    const unsigned char* alignment, int alignmentLength,
    EdlibCigarFormat cigarFormat);

#ifdef __cplusplus
}
#endif

#endif /* EDLIB_TPU_COMPAT_H */
