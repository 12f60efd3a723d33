/* Capture golden vectors from the reference M4RI binary.
 *
 * Every case reseeds srandom(17) (the contract tests/test_random.c:33-62
 * fixes), fills inputs with mzd_randomize in a documented order, runs the
 * op, and prints JSON: full P/Q swap arrays (mzp_t values) plus an FNV-1a
 * 64-bit hash over the result's bits (row-major, one byte 0/1 per bit —
 * layout independent, reproducible from a dense numpy array in Python).
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include "m4ri/m4ri.h"

static uint64_t fnv1a_matrix(const mzd_t *A) {
  uint64_t h = 0xcbf29ce484222325ULL;
  for (rci_t i = 0; i < A->nrows; ++i)
    for (rci_t j = 0; j < A->ncols; ++j) {
      h ^= (uint64_t)mzd_read_bit(A, i, j);
      h *= 0x100000001b3ULL;
    }
  return h;
}

static void print_perm(const char *name, const mzp_t *p) {
  printf("\"%s\": [", name);
  for (rci_t i = 0; i < p->length; ++i)
    printf(i ? ",%d" : "%d", (int)p->values[i]);
  printf("]");
}

static void ple_case(const char *kind, int m, int n, int lowrank_k) {
  srandom(17);
  mzd_t *A;
  if (lowrank_k > 0) {
    mzd_t *B = mzd_init(m, lowrank_k), *C = mzd_init(lowrank_k, n);
    mzd_randomize(B);   /* draw order: B then C */
    mzd_randomize(C);
    A = mzd_mul(NULL, B, C, 0);
    mzd_free(B); mzd_free(C);
  } else {
    A = mzd_init(m, n);
    mzd_randomize(A);
  }
  uint64_t in_hash = fnv1a_matrix(A);

  mzd_t *W = mzd_copy(NULL, A);
  mzp_t *P = mzp_init(m), *Q = mzp_init(n);
  rci_t r = mzd_ple(W, P, Q, 0);
  printf("{\"op\": \"ple\", \"kind\": \"%s\", \"m\": %d, \"n\": %d, "
         "\"k\": %d, \"rank\": %d, \"in_hash\": \"%016llx\", ",
         kind, m, n, lowrank_k, (int)r, (unsigned long long)in_hash);
  print_perm("P", P); printf(", "); print_perm("Q", Q);
  printf(", \"out_hash\": \"%016llx\"}\n",
         (unsigned long long)fnv1a_matrix(W));
  mzd_free(W); mzp_free(P); mzp_free(Q);

  W = mzd_copy(NULL, A);
  P = mzp_init(m); Q = mzp_init(n);
  r = mzd_pluq(W, P, Q, 0);
  printf("{\"op\": \"pluq\", \"kind\": \"%s\", \"m\": %d, \"n\": %d, "
         "\"k\": %d, \"rank\": %d, \"in_hash\": \"%016llx\", ",
         kind, m, n, lowrank_k, (int)r, (unsigned long long)in_hash);
  print_perm("P", P); printf(", "); print_perm("Q", Q);
  printf(", \"out_hash\": \"%016llx\"}\n",
         (unsigned long long)fnv1a_matrix(W));
  mzd_free(W); mzp_free(P); mzp_free(Q);

  W = mzd_copy(NULL, A);
  r = mzd_echelonize(W, 1);
  printf("{\"op\": \"rref\", \"kind\": \"%s\", \"m\": %d, \"n\": %d, "
         "\"k\": %d, \"rank\": %d, \"in_hash\": \"%016llx\", "
         "\"out_hash\": \"%016llx\"}\n",
         kind, m, n, lowrank_k, (int)r, (unsigned long long)in_hash,
         (unsigned long long)fnv1a_matrix(W));
  mzd_free(W); mzd_free(A);
}

static void mul_case(int m, int k, int n) {
  srandom(17);
  mzd_t *A = mzd_init(m, k), *B = mzd_init(k, n);
  mzd_randomize(A);   /* draw order: A then B */
  mzd_randomize(B);
  mzd_t *C = mzd_mul(NULL, A, B, 0);
  printf("{\"op\": \"mul\", \"m\": %d, \"k\": %d, \"n\": %d, "
         "\"a_hash\": \"%016llx\", \"b_hash\": \"%016llx\", "
         "\"out_hash\": \"%016llx\"}\n",
         m, k, n, (unsigned long long)fnv1a_matrix(A),
         (unsigned long long)fnv1a_matrix(B),
         (unsigned long long)fnv1a_matrix(C));
  mzd_free(A); mzd_free(B); mzd_free(C);
}

int main(void) {
  ple_case("square", 64, 64, 0);
  ple_case("square", 100, 100, 0);
  ple_case("square", 256, 256, 0);
  ple_case("square", 257, 255, 0);
  ple_case("wide", 128, 200, 0);
  ple_case("tall", 200, 128, 0);
  ple_case("lowrank", 150, 150, 50);
  ple_case("square", 1000, 1000, 0);
  mul_case(128, 100, 160);
  mul_case(256, 256, 256);
  mul_case(100, 1000, 100);
  return 0;
}
