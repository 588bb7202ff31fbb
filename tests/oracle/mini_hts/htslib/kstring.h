#ifndef MINI_HTS_KSTRING_H
#define MINI_HTS_KSTRING_H
typedef struct { size_t l, m; char *s; } kstring_t;
#endif
