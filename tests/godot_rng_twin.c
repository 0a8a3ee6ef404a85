/* Independent C twin of utils/godot_rng.py for cross-validation.
 *
 * A from-scratch transcription of the canonical pcg32 generator
 * (pcg-c-basic: pcg32_srandom_r / pcg32_random_r / pcg32_boundedrand_r,
 * the generator Godot vendors in thirdparty/misc/pcg.{h,cpp}) plus the
 * RandomNumberGenerator wiring (core/math/random_pcg.{h,cpp}: seed via
 * srandom(seed, PCG_DEFAULT_INC); randi_range = min + boundedrand(|a-b|+1)
 * with equal-endpoint short-circuit). Written independently of the Python
 * module so a transcription slip in either implementation makes the two
 * streams disagree (tests/test_rng.py compiles and runs this).
 *
 * Output: line 1 = the first 6 raw pcg32 outputs after srandom(42, 54)
 * (the published pcg-c-basic check vectors); line 2 = the first 6
 * randi_range(-10000, 10000) draws after set_seed(1234) (water.gd:68-69,
 * 31 semantics).
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

typedef struct { uint64_t state; uint64_t inc; } pcg32_t;

static uint32_t pcg32_random_r(pcg32_t *rng) {
    uint64_t oldstate = rng->state;
    rng->state = oldstate * 6364136223846793005ULL + rng->inc;
    uint32_t xorshifted = (uint32_t)(((oldstate >> 18u) ^ oldstate) >> 27u);
    uint32_t rot = (uint32_t)(oldstate >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((-rot) & 31u));
}

static void pcg32_srandom_r(pcg32_t *rng, uint64_t initstate, uint64_t initseq) {
    rng->state = 0U;
    rng->inc = (initseq << 1u) | 1u;
    pcg32_random_r(rng);
    rng->state += initstate;
    pcg32_random_r(rng);
}

static uint32_t pcg32_boundedrand_r(pcg32_t *rng, uint32_t bound) {
    uint32_t threshold = (uint32_t)(-bound) % bound;
    for (;;) {
        uint32_t r = pcg32_random_r(rng);
        if (r >= threshold) return r % bound;
    }
}

/* Godot core/math/random_pcg.h: PCG_DEFAULT_INC passed as initseq. */
#define GODOT_DEFAULT_INC 1442695040888963407ULL

/* RandomPCG::random(int p_from, int p_to) (core/math/random_pcg.cpp). */
static int64_t godot_randi_range(pcg32_t *rng, int64_t from, int64_t to) {
    if (from == to) return from;
    uint32_t bounds = (uint32_t)llabs(from - to) + 1u;
    int64_t lo = from < to ? from : to;
    return lo + (int64_t)pcg32_boundedrand_r(rng, bounds);
}

int main(void) {
    pcg32_t rng;

    /* pcg-c-basic check vectors: srandom(42, 54), round 1. */
    pcg32_srandom_r(&rng, 42u, 54u);
    for (int i = 0; i < 6; i++)
        printf("%s0x%08x", i ? " " : "", pcg32_random_r(&rng));
    printf("\n");

    /* water.gd: rng.set_seed(1234); per cascade two randi_range draws. */
    pcg32_srandom_r(&rng, 1234u, GODOT_DEFAULT_INC);
    for (int i = 0; i < 6; i++)
        printf("%s%lld", i ? " " : "",
               (long long)godot_randi_range(&rng, -10000, 10000));
    printf("\n");
    return 0;
}
