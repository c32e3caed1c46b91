/* Minimal C consumer of the native A*PA library (cf. the reference's
 * astarpa-c/example.c). Build: make example && ./example */
#include <stdio.h>
#include <string.h>

#include "astarpa.h"

int main(void) {
  const char* a = "ACGTGTCGACGTACGTTAGC";
  const char* b = "ACGTGTCCACGTACGTAGC";
  char* cigar = NULL;
  int cost = astarpa((const uint8_t*)a, (int)strlen(a), (const uint8_t*)b,
                     (int)strlen(b), &cigar);
  printf("cost=%d cigar=%s\n", cost, cigar);
  astarpa_free(cigar);

  cost = astarpa_gcsh((const uint8_t*)a, (int)strlen(a), (const uint8_t*)b,
                      (int)strlen(b), 1, 8, 0, &cigar);
  printf("gcsh r=1 k=8: cost=%d cigar=%s\n", cost, cigar);
  astarpa_free(cigar);
  return 0;
}
